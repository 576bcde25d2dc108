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
