"""Gather-based bilinear sampling — the TPU equivalent of grid_sample /
deformable offsets.

Replaces the CUDA kernels behind the reference's hot sampling paths:
- RAFT's correlation-pyramid lookup (ProPainter/RAFT/corr.py:12, built on
  F.grid_sample),
- ProPainter's flow warping (model/modules/flow_loss_utils.py / infer flows)
- torchvision deform_conv2d (ProPainter/model/propainter.py:67,
  model/recurrent_flow_completion.py:42) — SURVEY.md §2d item 3.

On TPU a gather lowers to dynamic-slice/one-hot matmuls; XLA handles the
vectorization. Coordinates are in pixel units (x right, y down).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray,
                    zero_outside: bool = False) -> jnp.ndarray:
    """img: (H, W, C); coords: (..., 2) as (x, y) pixel coordinates.
    Border-clamped (grid_sample padding_mode='border'), or zero padding when
    zero_outside. Returns (..., C)."""
    H, W, C = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def gather(yy, xx):
        yc = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        xc = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        val = img[yc, xc]
        if zero_outside:
            # zero-padding semantics: each corner contributes only if it is
            # a real pixel (torch grid_sample padding_mode='zeros', which is
            # what torchvision deform_conv2d uses)
            ok = ((yy >= 0) & (yy <= H - 1) & (xx >= 0)
                  & (xx <= W - 1))[..., None]
            val = jnp.where(ok, val, 0.0)
        return val

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def bilinear_sample_batch(imgs: jnp.ndarray, coords: jnp.ndarray,
                          zero_outside: bool = False) -> jnp.ndarray:
    """imgs: (B, H, W, C); coords: (B, ..., 2)."""
    return jax.vmap(lambda i, c: bilinear_sample(i, c, zero_outside))(
        imgs, coords)


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img by flow: out(p) = img(p + flow(p)).
    img: (B, H, W, C); flow: (B, H, W, 2) in pixels (x, y)."""
    B, H, W, _ = flow.shape
    ys = jnp.arange(H, dtype=flow.dtype)
    xs = jnp.arange(W, dtype=flow.dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    base = jnp.stack([gx, gy], axis=-1)[None]
    return bilinear_sample_batch(img, base + flow)


def deform_conv2d_window(x: jnp.ndarray, offsets: jnp.ndarray,
                         kernel: jnp.ndarray,
                         bias: jnp.ndarray | None = None,
                         mask: jnp.ndarray | None = None,
                         kh: int = 3, kw: int = 3,
                         deform_groups: int = 1,
                         max_abs_offset: float = 5.0) -> jnp.ndarray:
    """Exact deform_conv2d for BOUNDED offsets, without gathers.

    Valid when every learned offset satisfies |offset| <= max_abs_offset
    (ProPainter's alignment offsets are `max_residue * tanh(.)`,
    recurrent_flow_completion.py:41 / propainter.py:63 — bounded by
    construction when no flow prior is added). Then every sampling
    position lies within K + max_abs_offset of its pixel, so the whole
    bilinear sampling is a contraction over a STATIC (D x D) window of
    shifted copies of x, with separable iota-comparison weights:

        out[p,g,t,c] = sum_dx wx[p,g,t,dx] (sum_dy wy[p,g,t,dy]
                                             x[y+dy, x+dx, g*cg:])

    This replaces the per-(tap,group) scalar gathers — the same TPU
    pathology as RAFT's corr lookup (43 of 45.6 s; see decomp/raft.py
    _corr_lookup) — with dense VPU/MXU math: ~2.4 GFLOP per call at the
    flow-completion shape. Out-of-image taps contribute zero via the
    zero-padded shifts (torchvision padding_mode='zeros' semantics).
    Numerics match deform_conv2d to fp reassociation.

    Same signature/layout as deform_conv2d plus `max_abs_offset`.
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    G = deform_groups
    cg = Cin // G
    K = max((kh - 1) // 2, (kw - 1) // 2)
    import numpy as _np
    R = int(_np.ceil(max_abs_offset))
    lo, hi = K + R, K + R + 1
    D = lo + hi + 1

    # absolute per-axis tap positions relative to the pixel:
    # (B, H, W, G, kh*kw)
    off = offsets.reshape(B, H, W, G, kh * kw, 2)
    tap_dy = jnp.asarray([(t // kw) - (kh - 1) / 2
                          for t in range(kh * kw)], jnp.float32)
    tap_dx = jnp.asarray([(t % kw) - (kw - 1) / 2
                          for t in range(kh * kw)], jnp.float32)
    ay = off[..., 0].astype(jnp.float32) + tap_dy
    ax = off[..., 1].astype(jnp.float32) + tap_dx

    def win_weights(a):
        """(..., ) positions -> (..., D) bilinear weights over the static
        window delta in [-lo, hi]."""
        f0 = jnp.floor(a)
        frac = a - f0
        delta = jnp.arange(D, dtype=jnp.float32) - lo
        eq0 = (delta == f0[..., None])
        eq1 = (delta == f0[..., None] + 1.0)
        return eq0 * (1.0 - frac[..., None]) + eq1 * frac[..., None]

    wy = win_weights(ay)                     # (B,H,W,G,T,D)
    wx = win_weights(ax)

    xg = x.reshape(B, H, W, G, cg).astype(jnp.float32)
    xpad = jnp.pad(xg, ((0, 0), (lo, hi), (lo, hi), (0, 0), (0, 0)))

    # loop the x-window statically; contract the y-window per shift
    out_taps = jnp.zeros((B, H, W, G, kh * kw, cg), jnp.float32)
    ydy = jnp.stack([xpad[:, d:d + H, :, :, :] for d in range(D)], axis=0)
    for dx in range(D):
        col = ydy[:, :, :, dx:dx + W]        # (D, B, H, W, G, cg)
        s = jnp.einsum("dbhwgc,bhwgtd->bhwgtc", col, wy)
        out_taps = out_taps + s * wx[..., dx][..., None]
    if mask is not None:
        m = mask.reshape(B, H, W, G, kh * kw)
        out_taps = out_taps * m[..., None].astype(jnp.float32)

    # torchvision column order: (g, tap) blocks -> (tap, g) for the matmul
    stacked = out_taps.transpose(0, 1, 2, 4, 3, 5).reshape(
        B, H, W, kh * kw * Cin).astype(x.dtype)
    kmat = kernel.reshape(kh * kw * Cin, Cout)
    out = stacked.reshape(-1, kh * kw * Cin) @ kmat.astype(stacked.dtype)
    out = out.reshape(B, H, W, Cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray | None = None,
                  mask: jnp.ndarray | None = None,
                  kh: int = 3, kw: int = 3,
                  deform_groups: int = 1) -> jnp.ndarray:
    """Modulated deformable conv (torchvision deform_conv2d semantics,
    stride 1, same padding).

    x: (B, H, W, Cin); offsets: (B, H, W, G*kh*kw*2) as (dy, dx) pairs in
    torchvision's (group, tap) order; kernel: (kh, kw, Cin, Cout);
    mask: (B, H, W, G*kh*kw) modulation (post-sigmoid) or None. With
    deform_groups=G, the g-th Cin/G channel slab samples with the g-th
    offset/mask block.

    Implementation: one bilinear gather per (group, kernel tap) then a
    single (B*H*W, kh*kw*Cin) x (kh*kw*Cin, Cout) matmul — MXU-friendly.
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    G = deform_groups
    cg = Cin // G
    ys = jnp.arange(H, dtype=x.dtype)
    xs = jnp.arange(W, dtype=x.dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")

    taps = []
    for t in range(kh * kw):         # torchvision order: rows, then cols
        i, j = t // kw, t % kw
        groups = []
        for g in range(G):
            idx = g * kh * kw + t
            dy = offsets[..., 2 * idx]
            dx = offsets[..., 2 * idx + 1]
            cy = gy[None] + (i - (kh - 1) / 2) + dy
            cx = gx[None] + (j - (kw - 1) / 2) + dx
            coords = jnp.stack([cx, cy], axis=-1)
            v = bilinear_sample_batch(x[..., g * cg:(g + 1) * cg], coords,
                                      zero_outside=True)
            if mask is not None:
                v = v * mask[..., idx][..., None]
            groups.append(v)
        taps.append(groups[0] if G == 1 else jnp.concatenate(groups, -1))

    stacked = jnp.concatenate(taps, axis=-1)          # (B, H, W, kh*kw*Cin)
    kmat = kernel.reshape(kh * kw * Cin, Cout)
    out = stacked.reshape(-1, kh * kw * Cin) @ kmat.astype(stacked.dtype)
    out = out.reshape(B, H, W, Cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
