"""Functional NN primitives (pure fns over param pytrees), channels-last.

Conventions
-----------
- Feature maps are NHWC: ``(N, H, W, C)``; videos fold frames into batch
  before spatial ops (``(B, F, H, W, C) -> (B*F, H, W, C)``), which is the
  TPU-native equivalent of the reference's InflatedConv3d/InflatedGroupNorm
  rearranges (reference: src/models/resnet.py:9-28).
- Linear kernels are ``(in, out)``; conv kernels are HWIO ``(kh, kw, cin, cout)``.
- Norms and softmax statistics accumulate in fp32 regardless of compute dtype.

Torch-parity notes: semantics match torch.nn.{Linear, Conv2d, GroupNorm,
LayerNorm} and diffusers' Attention / GEGLU feed-forward, which is what the
reference models are built from. Tests in tests/test_layers.py check this
numerically against CPU torch.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------


def linear_init(key, d_in: int, d_out: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    kk, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"kernel": _uniform(kk, (d_in, d_out), bound, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (d_out,), bound, dtype)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# conv2d (NHWC / HWIO)
# ---------------------------------------------------------------------------


def conv2d_init(key, kh: int, kw: int, c_in: int, c_out: int,
                bias: bool = True, dtype=jnp.float32, zero: bool = False,
                groups: int = 1) -> Params:
    kk, kb = jax.random.split(key)
    c_in = c_in // groups
    if zero:
        p = {"kernel": jnp.zeros((kh, kw, c_in, c_out), dtype)}
        if bias:
            p["bias"] = jnp.zeros((c_out,), dtype)
        return p
    bound = 1.0 / math.sqrt(c_in * kh * kw)
    p = {"kernel": _uniform(kk, (kh, kw, c_in, c_out), bound, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (c_out,), bound, dtype)
    return p


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1,
           padding: int | str = "SAME", groups: int = 1) -> jnp.ndarray:
    """x: (N, H, W, C). groups=C with an (kh, kw, 1, C) kernel is a
    depthwise conv (torch Conv2d(groups=C) equivalent)."""
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# norms (fp32 statistics)
# ---------------------------------------------------------------------------


def group_norm_init(channels: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((channels,), dtype),
            "bias": jnp.zeros((channels,), dtype)}


def group_norm(p: Params, x: jnp.ndarray, groups: int,
               eps: float = 1e-5, barrier: bool = True,
               mode: str = "fp32", fuse_silu: bool = False,
               fused: bool = False,
               row_add: "Optional[jnp.ndarray]" = None,
               snc: bool = False) -> jnp.ndarray:
    """GroupNorm over the trailing channel axis of an (..., C) tensor.

    Statistics are computed per (leading batch axis, group) over all other
    axes, in fp32 — matches torch.nn.GroupNorm on (N, C, *spatial) with our
    channels-last layout.

    `fused=True` routes the fp32 path through the Pallas kernel on TPU
    (ops/groupnorm.py): 1-2 HBM reads + 1 write instead of XLA's 3+1.
    Measured (BENCH_NOTES.md): a clear win in the VAE programs (prepare
    1.44→0.72 s, decode 2.27→1.13 s). The original (N, S, C) kernel was a
    net LOSS inside the denoise step (the opaque kernel broke XLA's
    elementwise fusions around each GroupNorm: +117 ms/step of standalone
    adds vs −134 ms of reductions), but the later SNC-layout kernel with
    `row_add` folding the resnet temb adds made it a win — the UNets now
    route through `fused=True, snc=True` at every resnet/transformer/
    out-head site (models/unet.py). `fuse_silu` folds the following SiLU
    into the same pass (resnet GN→SiLU→conv chains) on either path.

    `barrier` (default on): materialize the output before the consumer
    (XLA fallback path only — the Pallas kernel is opaque to fusion
    anyway). Measured on v5e: letting XLA fuse GN statistics into a
    following conv is catastrophic — GN+SiLU+conv3x3 at the UNet's top
    level runs 177 ms fused vs 8.6 ms with the barrier (the conv alone is
    18 ms). Set barrier=False when the consumer is a matmul (LN+matmul
    fuses WELL and a barrier there costs 40x).

    `mode`: "fp32" (default, torch-matching) normalizes and applies the
    affine in fp32; "bf16" keeps the centered/scaled tensor in the input
    dtype (faster, reduced precision). Explicit parameters — no ambient
    environment reads — so numerics are reproducible from the call site.

    `snc` (fused path only): run the transposed-layout (S, N, C) kernel,
    which matches XLA's conv-activation layout so the custom-call
    operands bitcast instead of relayout-copying — pass True at
    conv-adjacent sites (UNet resnets/transformers).
    """
    if fused and mode == "fp32":
        from mimo_tpu.ops.groupnorm import group_norm_fused
        y = group_norm_fused(x, p["scale"], p["bias"], groups, eps,
                             fuse_silu=fuse_silu, row_add=row_add, snc=snc)
        if y is not None:
            return y
    if row_add is not None:
        # (N, C) broadcast addend (resnet temb); fused in-kernel on the
        # Pallas path, a plain elementwise add here
        c = x.shape[-1]
        x = x + row_add.reshape(
            row_add.shape[0], *([1] * (x.ndim - 2)), c).astype(x.dtype)
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    xg = x.reshape(n, -1, groups, c // groups)
    xf = xg.astype(jnp.float32)
    # two-pass stats as reductions only (XLA convert_reduce fusions) — the
    # fp32 upcast is never materialized as a full tensor
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) \
        - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    if mode == "bf16":
        y = (xg - mean.astype(orig_dtype)) * inv.astype(orig_dtype)
        y = y.reshape(x.shape)
        y = y * p["scale"].astype(orig_dtype) + p["bias"].astype(orig_dtype)
    else:
        y = (xf - mean) * inv
        y = y.reshape(x.shape)
        y = (y * p["scale"].astype(jnp.float32)
             + p["bias"].astype(jnp.float32)).astype(orig_dtype)
    if fuse_silu:
        y = y * jax.nn.sigmoid(y)
    if barrier:
        y = jax.lax.optimization_barrier(y)
    return y


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def mha_init(key, query_dim: int, context_dim: Optional[int] = None,
             inner_dim: Optional[int] = None, out_bias: bool = True,
             dtype=jnp.float32) -> Params:
    """diffusers-style Attention params: to_q/to_k/to_v (no bias) + to_out."""
    context_dim = context_dim or query_dim
    inner_dim = inner_dim or query_dim
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "to_q": linear_init(k1, query_dim, inner_dim, bias=False, dtype=dtype),
        "to_k": linear_init(k2, context_dim, inner_dim, bias=False, dtype=dtype),
        "to_v": linear_init(k3, context_dim, inner_dim, bias=False, dtype=dtype),
        "to_out": linear_init(k4, inner_dim, query_dim, bias=out_bias, dtype=dtype),
    }


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         heads: int) -> jnp.ndarray:
    """Scaled dot-product attention over (B, S, inner) tensors.

    Splits heads, accumulates softmax statistics in fp32, returns
    (B, Sq, inner). Long sequences dispatch to the Pallas flash kernel on
    TPU (ops/attention.py); short ones use XLA's fused path.
    """
    from mimo_tpu.ops.attention import dispatch_sdpa
    return dispatch_sdpa(q, k, v, heads)


def mha(p: Params, x: jnp.ndarray, context: Optional[jnp.ndarray],
        heads: int) -> jnp.ndarray:
    """Multi-head attention: x (B, Sq, Dq), context (B, Sk, Dk) or None."""
    ctx = x if context is None else context
    q = linear(p["to_q"], x)
    k = linear(p["to_k"], ctx)
    v = linear(p["to_v"], ctx)
    o = sdpa(q, k, v, heads)
    return linear(p["to_out"], o)


# ---------------------------------------------------------------------------
# feed-forward (GEGLU, diffusers FeedForward default)
# ---------------------------------------------------------------------------


def geglu_ff_init(key, dim: int, mult: int = 4, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {
        "proj_in": linear_init(k1, dim, inner * 2, dtype=dtype),
        "proj_out": linear_init(k2, inner, dim, dtype=dtype),
    }


def geglu_ff(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = linear(p["proj_in"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    return linear(p["proj_out"], h)


# ---------------------------------------------------------------------------
# timestep embedding (diffusers Timesteps + TimestepEmbedding)
# ---------------------------------------------------------------------------


def sinusoidal_timestep_embedding(t: jnp.ndarray, dim: int,
                                  flip_sin_to_cos: bool = True,
                                  freq_shift: float = 0.0,
                                  max_period: float = 10000.0) -> jnp.ndarray:
    """t: (B,) float/int -> (B, dim) fp32. Matches diffusers get_timestep_embedding."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * t.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


def time_mlp_init(key, in_dim: int, embed_dim: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, in_dim, embed_dim, dtype=dtype),
        "fc2": linear_init(k2, embed_dim, embed_dim, dtype=dtype),
    }


def time_mlp(p: Params, emb: jnp.ndarray) -> jnp.ndarray:
    h = linear(p["fc1"], emb)
    h = jax.nn.silu(h)
    return linear(p["fc2"], h)


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C) nearest-neighbor (reference
    Upsample3D, src/models/resnet.py:31-90)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def upsample_nearest_to(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """Nearest-neighbor resize to an explicit (th, tw) — needed when skip
    sizes are odd (e.g. 98→49→25→13 latents); matches torch
    F.interpolate(size=..., mode='nearest') = floor(i*n/s) indexing
    (reference forwards `upsample_size`, unet_3d_edit_bkfill.py:540-548)."""
    n, h, w, c = x.shape
    if (th, tw) == (2 * h, 2 * w):
        return upsample_nearest_2x(x)
    yi = (jnp.arange(th) * h) // th
    xi = (jnp.arange(tw) * w) // tw
    return x[:, yi][:, :, xi]


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)
