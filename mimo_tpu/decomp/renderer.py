"""JAX software rasterizer: vertex-colored mesh → image + depth (z-buffer).

Replaces the reference's pyrender/EGL offscreen renderer used to draw the
SMPL "sdc" encoding video (hmr2/utils/renderer.py:143-455,
render_rgba_multiple at :365). TPU-native design: barycentric coverage
tests over pixel grids, faces processed in static-size chunks with a
`lax.scan` z-buffer reduction — no data-dependent shapes, batches over
frames with `vmap`.

Camera model matches the reference's weak-perspective-to-full-image
convention (`cam_crop_to_full`, hmr2/utils/renderer.py:19-29): vertices
arrive in camera space; we project with intrinsics (focal, cx, cy).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def project(verts: jnp.ndarray, focal: jnp.ndarray,
            center: jnp.ndarray) -> jnp.ndarray:
    """Perspective projection. verts (V, 3) cam-space (+z forward) ->
    (V, 2) pixel coords."""
    xy = verts[..., :2] / jnp.maximum(verts[..., 2:3], 1e-6)
    return xy * focal + center


@partial(jax.jit, static_argnames=("height", "width", "face_chunk"))
def rasterize(verts: jnp.ndarray, faces: jnp.ndarray, colors: jnp.ndarray,
              focal: jnp.ndarray, center: jnp.ndarray, *, height: int,
              width: int, face_chunk: int = 512):
    """Render one mesh.

    verts: (V, 3) camera-space; faces: (F, 3) int32; colors: (V, 3) vertex
    colors in [0, 1]; focal: scalar or (2,); center: (2,).
    Returns (rgb (H, W, 3), alpha (H, W), depth (H, W)).
    """
    V = verts.shape[0]
    F = faces.shape[0]
    pad = (-F) % face_chunk
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
        valid = jnp.concatenate(
            [jnp.ones((F,), bool), jnp.zeros((pad,), bool)])
    else:
        valid = jnp.ones((F,), bool)
    n_chunks = faces.shape[0] // face_chunk

    pts2d = project(verts, focal, center)                  # (V, 2)
    zs = verts[:, 2]

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))

    faces_r = faces.reshape(n_chunks, face_chunk, 3)
    valid_r = valid.reshape(n_chunks, face_chunk)

    init = (jnp.full((height, width), jnp.inf, jnp.float32),   # zbuf
            jnp.zeros((height, width, 3), jnp.float32),        # rgb
            jnp.zeros((height, width), jnp.float32))           # alpha

    def body(carry, inputs):
        zbuf, rgb, alpha = carry
        f, ok = inputs                                     # (C, 3), (C,)
        tri = pts2d[f]                                     # (C, 3, 2)
        tz = zs[f]                                         # (C, 3)
        tc = colors[f]                                     # (C, 3, 3)

        x0, y0 = tri[:, 0, 0], tri[:, 0, 1]
        x1, y1 = tri[:, 1, 0], tri[:, 1, 1]
        x2, y2 = tri[:, 2, 0], tri[:, 2, 1]
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        inv_area = jnp.where(jnp.abs(area) < 1e-9, 0.0, 1.0 / area)

        # barycentrics per pixel per face: (C, H, W)
        def edge(ax, ay, bx, by):
            return ((bx[:, None, None] - ax[:, None, None])
                    * (py[None] - ay[:, None, None])
                    - (by[:, None, None] - ay[:, None, None])
                    * (px[None] - ax[:, None, None]))

        w0 = edge(x1, y1, x2, y2) * inv_area[:, None, None]
        w1 = edge(x2, y2, x0, y0) * inv_area[:, None, None]
        w2 = 1.0 - w0 - w1

        front = tz > 1e-6
        cover = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                 & (jnp.abs(area) > 1e-9)[:, None, None]
                 & ok[:, None, None]
                 & front.all(axis=1)[:, None, None])
        z = (w0 * tz[:, 0, None, None] + w1 * tz[:, 1, None, None]
             + w2 * tz[:, 2, None, None])
        z = jnp.where(cover, z, jnp.inf)

        # nearest face in this chunk per pixel
        best = jnp.argmin(z, axis=0)                        # (H, W)
        zmin = jnp.take_along_axis(z, best[None], axis=0)[0]
        hit = jnp.isfinite(zmin) & (zmin < zbuf)

        def gather_w(w):
            return jnp.take_along_axis(w, best[None], axis=0)[0]

        w0b, w1b, w2b = gather_w(w0), gather_w(w1), gather_w(w2)
        col_f = tc[best]                                    # (H, W, 3, 3)
        col = (w0b[..., None] * col_f[..., 0, :]
               + w1b[..., None] * col_f[..., 1, :]
               + w2b[..., None] * col_f[..., 2, :])

        zbuf = jnp.where(hit, zmin, zbuf)
        rgb = jnp.where(hit[..., None], col, rgb)
        alpha = jnp.where(hit, 1.0, alpha)
        return (zbuf, rgb, alpha), None

    (zbuf, rgb, alpha), _ = jax.lax.scan(body, init, (faces_r, valid_r))
    depth = jnp.where(jnp.isfinite(zbuf), zbuf, 0.0)
    return rgb, alpha, depth


@partial(jax.jit, static_argnames=("height", "width", "face_chunk", "band"))
def rasterize_banded(verts: jnp.ndarray, faces: jnp.ndarray,
                     colors: jnp.ndarray, focal: jnp.ndarray,
                     center: jnp.ndarray, *, height: int, width: int,
                     face_chunk: int = 256, band: int = 64):
    """Row-band rasterizer: faces sorted by projected y-min, each chunk
    rasterized only against a `band`-row window starting at the chunk's
    own min row (dynamic_slice into the z/rgb/alpha buffers).

    Why: the brute-force kernel tests every face against every pixel —
    F·H·W = 4.8 G coverage tests/frame at the SMPL/720×480 shape,
    measured 2.8 s/frame on v5e (round-4 decomp ledger). Faces sorted by
    ymin cluster tightly in y (13776 faces over a ~400-row body ≈ 34
    faces/row, so a 256-face chunk spans ~8-10 rows + ~4-row face
    height), cutting tested pixels ~11×. Exactness is guarded, not
    assumed: any face taller than its chunk's band sets the returned
    `bad` flag and render_frames falls back to the full-height kernel
    for that frame.

    Returns (rgb, alpha, depth, bad). Ties (equal z) may resolve to a
    different face than the unsorted kernel — same arbitrariness class
    as pyrender's rasterization order.
    """
    V = verts.shape[0]
    F = faces.shape[0]
    pad = (-F) % face_chunk
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
        valid = jnp.concatenate(
            [jnp.ones((F,), bool), jnp.zeros((pad,), bool)])
    else:
        valid = jnp.ones((F,), bool)
    n_chunks = faces.shape[0] // face_chunk

    pts2d = project(verts, focal, center)                  # (V, 2)
    zs = verts[:, 2]

    # sort faces by projected y-min; padded/invalid faces sort last
    tri_y = pts2d[faces][:, :, 1]                          # (Fp, 3)
    face_ymin = jnp.where(valid, tri_y.min(axis=1), jnp.inf)
    order = jnp.argsort(face_ymin)
    faces = faces[order]
    valid = valid[order]

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    dy = jnp.arange(band, dtype=jnp.float32) + 0.5
    px = jnp.broadcast_to(xs[None, :], (band, width))

    init = (jnp.full((height, width), jnp.inf, jnp.float32),   # zbuf
            jnp.zeros((height, width, 3), jnp.float32),        # rgb
            jnp.zeros((height, width), jnp.float32),           # alpha
            jnp.zeros((), bool))                               # bad

    def body(carry, inputs):
        zbuf, rgb, alpha, bad = carry
        f, ok = inputs                                     # (C, 3), (C,)
        tri = pts2d[f]                                     # (C, 3, 2)
        tz = zs[f]                                         # (C, 3)
        tc = colors[f]                                     # (C, 3, 3)

        ty = tri[:, :, 1]
        ymin_f = jnp.where(ok, ty.min(axis=1), jnp.inf)
        ymax_f = ty.max(axis=1)
        y0 = jnp.clip(jnp.floor(jnp.min(ymin_f)).astype(jnp.int32),
                      0, height - band)
        # exactness guard: every valid on-screen face row must fall in
        # [y0, y0+band)
        ymax_eff = jnp.minimum(ymax_f, height - 1.0)
        bad = bad | jnp.any(ok & (ymax_eff >= y0.astype(jnp.float32)
                                  + band))

        py = dy[:, None] + y0.astype(jnp.float32)          # (band, W) rows
        py = jnp.broadcast_to(py, (band, width))

        x0, y0f = tri[:, 0, 0], tri[:, 0, 1]
        x1, y1 = tri[:, 1, 0], tri[:, 1, 1]
        x2, y2 = tri[:, 2, 0], tri[:, 2, 1]
        area = (x1 - x0) * (y2 - y0f) - (x2 - x0) * (y1 - y0f)
        inv_area = jnp.where(jnp.abs(area) < 1e-9, 0.0, 1.0 / area)

        def edge(ax, ay, bx, by):
            return ((bx[:, None, None] - ax[:, None, None])
                    * (py[None] - ay[:, None, None])
                    - (by[:, None, None] - ay[:, None, None])
                    * (px[None] - ax[:, None, None]))

        w0 = edge(x1, y1, x2, y2) * inv_area[:, None, None]
        w1 = edge(x2, y2, x0, y0f) * inv_area[:, None, None]
        w2 = 1.0 - w0 - w1

        front = tz > 1e-6
        cover = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                 & (jnp.abs(area) > 1e-9)[:, None, None]
                 & ok[:, None, None]
                 & front.all(axis=1)[:, None, None])
        z = (w0 * tz[:, 0, None, None] + w1 * tz[:, 1, None, None]
             + w2 * tz[:, 2, None, None])
        z = jnp.where(cover, z, jnp.inf)

        best = jnp.argmin(z, axis=0)                       # (band, W)
        zmin = jnp.take_along_axis(z, best[None], axis=0)[0]

        zb = jax.lax.dynamic_slice(zbuf, (y0, 0), (band, width))
        rb = jax.lax.dynamic_slice(rgb, (y0, 0, 0), (band, width, 3))
        ab = jax.lax.dynamic_slice(alpha, (y0, 0), (band, width))
        hit = jnp.isfinite(zmin) & (zmin < zb)

        def gather_w(w):
            return jnp.take_along_axis(w, best[None], axis=0)[0]

        w0b, w1b, w2b = gather_w(w0), gather_w(w1), gather_w(w2)
        col_f = tc[best]                                   # (band, W, 3, 3)
        col = (w0b[..., None] * col_f[..., 0, :]
               + w1b[..., None] * col_f[..., 1, :]
               + w2b[..., None] * col_f[..., 2, :])

        zbuf = jax.lax.dynamic_update_slice(
            zbuf, jnp.where(hit, zmin, zb), (y0, 0))
        rgb = jax.lax.dynamic_update_slice(
            rgb, jnp.where(hit[..., None], col, rb), (y0, 0, 0))
        alpha = jax.lax.dynamic_update_slice(
            alpha, jnp.where(hit, 1.0, ab), (y0, 0))
        return (zbuf, rgb, alpha, bad), None

    faces_r = faces.reshape(n_chunks, face_chunk, 3)
    valid_r = valid.reshape(n_chunks, face_chunk)
    (zbuf, rgb, alpha, bad), _ = jax.lax.scan(body, init, (faces_r, valid_r))
    depth = jnp.where(jnp.isfinite(zbuf), zbuf, 0.0)
    return rgb, alpha, depth, bad


def render_over(rgb: jnp.ndarray, alpha: jnp.ndarray,
                background: jnp.ndarray) -> jnp.ndarray:
    """Alpha-composite the render over a background frame (reference
    render_rgba_multiple overlay semantics)."""
    return rgb * alpha[..., None] + background * (1 - alpha[..., None])


def render_frames(verts_per_frame: jnp.ndarray, faces: jnp.ndarray,
                  colors: jnp.ndarray, focal, center, *, height: int,
                  width: int, face_chunk: int = 128, band: int = 64,
                  band_chunk: int = 256):
    """Frames rendered by a HOST loop over one jitted per-frame rasterize,
    NOT vmap and NOT lax.map (measured on the round-4 real-chip ledger):
    - vmap batches the (face_chunk, H, W) barycentric tensors to
      (T, face_chunk, H, W) — ~34 GB live set at 48f/720×480/512 and the
      XLA compile itself dies (tpu_compile_helper exit 1);
    - lax.map compiles ONE program whose runtime scales with T — at T=48
      it runs >60 s and the axon TPU worker's execution watchdog kills it
      ("TPU worker process crashed"; T=2 and T=4 versions of the same
      program pass).
    The host loop reuses a single cached executable (~35 ms dispatch each,
    rasterize itself dominates). verts (T, V, 3) -> (T, H, W, 3), (T, H, W).

    Round 4: the per-frame kernel is the row-band rasterizer (~11× fewer
    coverage tests); a frame whose geometry violates the band (face taller
    than `band` rows within one y-sorted chunk) falls back to the exact
    full-height kernel — correctness never depends on the heuristic.
    """
    use_band = band and band < height
    outs = []
    for v in verts_per_frame:
        if use_band:
            rgbf, alphaf, depthf, bad = rasterize_banded(
                v, faces, colors, focal, center, height=height,
                width=width, face_chunk=band_chunk, band=band)
            if not bool(bad):
                outs.append((rgbf, alphaf, depthf))
                continue
        outs.append(rasterize(v, faces, colors, focal, center,
                              height=height, width=width,
                              face_chunk=face_chunk))
    rgb = jnp.stack([o[0] for o in outs])
    alpha = jnp.stack([o[1] for o in outs])
    depth = jnp.stack([o[2] for o in outs])
    return rgb, alpha, depth
