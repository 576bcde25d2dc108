"""Frame-parallel sharding for the decomposition half.

The reference's template extraction is a single-GPU per-frame loop
(`video_decomp/run.py:556-839`); BASELINE.json config 5 names the same
workload "frames data-parallel sharded across a v5e-8 mesh". Every heavy
decomp model is per-frame independent (ViTPose / HMR2 / HaMeR crops,
DepthAnythingV2, the SDC rasterizer) — only SAM2's memory attention is
sequential — so the TPU-native scaling layer is plain frame-axis data
parallelism: `shard_map` over a 1-D mesh, weights replicated, the frame
batch split, zero collectives (outputs gather on the host exactly like
the single-device path).

Two entry points:
- `frame_parallel(fn, mesh)` wraps any `fn(params, batch) -> pytree`
  whose leading axis is per-sample independent; used by the factory for
  the ViTPose / HMR2 / HaMeR forward programs.
- `render_frames_sharded(...)` is the mesh form of
  `decomp.renderer.render_frames`: each device rasterizes its local
  frames with a `lax.map` over the banded kernel (+ `lax.cond` exact
  fallback — the host-loop fallback decision becomes a traced branch).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mimo_tpu.decomp import renderer as REND


def _pad_to(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    """Pad the leading axis up to a multiple of `mult` by repeating the
    last sample (repeat, not zeros: model forwards may divide by stats of
    their input; a duplicated real sample is always in-distribution)."""
    pad = (-x.shape[0]) % mult
    if not pad:
        return x
    return jnp.concatenate(
        [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0)


def frame_parallel(fn: Callable, mesh: Mesh,
                   axis: str = "data") -> Callable:
    """Wrap `fn(params, batch)` so the leading batch axis runs
    data-parallel over `mesh`: params replicate, the batch (padded to a
    multiple of the axis size) shards, every output's leading axis shards
    and is sliced back to the true batch length.

    `fn` must be per-sample independent along the leading axis (true for
    all the crop/frame model forwards here) — the shard_map body is then
    exactly the single-device program on a 1/n slice, so numerics match
    the unsharded call bit-for-bit per sample.
    """
    n = mesh.shape[axis]
    body = shard_map(fn, mesh=mesh, in_specs=(P(), P(axis)),
                     out_specs=P(axis))

    def wrapped(params, batch):
        b = batch.shape[0]
        out = body(params, _pad_to(batch, n))
        return jax.tree.map(lambda o: o[:b], out)

    return wrapped


def render_frames_sharded(verts_per_frame: jnp.ndarray, faces: jnp.ndarray,
                          colors: jnp.ndarray, focal, center, *,
                          height: int, width: int, mesh: Mesh,
                          axis: str = "data", face_chunk: int = 128,
                          band: int = 64, band_chunk: int = 256):
    """`decomp.renderer.render_frames` over a device mesh: frames shard,
    faces/colors replicate. Each device runs `lax.map` over its local
    frames; the banded-kernel exactness fallback (renderer.py: a face
    taller than its chunk's band) becomes a `lax.cond` into the
    full-height kernel, so outputs equal the host-loop path.

    The per-device program rasterizes T/n frames back-to-back — keep
    T/n * per-frame time under the axon execution watchdog (~60 s) when
    running on real chips (at the post-band ~0.3 s/frame target that is
    >100 frames/device).
    """
    T = verts_per_frame.shape[0]
    n = mesh.shape[axis]
    use_band = band and band < height

    def one(v):
        if use_band:
            rgbb, ab, db, bad = REND.rasterize_banded(
                v, faces, colors, focal, center, height=height,
                width=width, face_chunk=band_chunk, band=band)

            def full(_):
                return REND.rasterize(v, faces, colors, focal, center,
                                      height=height, width=width,
                                      face_chunk=face_chunk)

            return jax.lax.cond(bad, full, lambda _: (rgbb, ab, db), None)
        return REND.rasterize(v, faces, colors, focal, center,
                              height=height, width=width,
                              face_chunk=face_chunk)

    def local(v_local):
        return jax.lax.map(one, v_local)

    # check_vma off: the rasterizer's scan carries start as replicated
    # zeros and become device-varying after the first chunk, which the
    # varying-manual-axes checker rejects; the body is collective-free so
    # the check buys nothing here
    body = shard_map(local, mesh=mesh, in_specs=(P(axis),),
                     out_specs=P(axis), check_vma=False)
    out = body(_pad_to(verts_per_frame, n))
    return jax.tree.map(lambda o: o[:T], out)
