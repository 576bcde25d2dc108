"""Fused LayerNorm + GEGLU feed-forward Pallas kernel.

The transformer-block FF chain (LN -> proj_in -> gelu-gate -> proj_out ->
+residual; reference: diffusers FeedForward/GEGLU as instantiated by
src/models/mutual_self_attention.py's BasicTransformerBlock and
motion_module.py's temporal blocks) is ~180 ms of a 1.03 s denoise step,
with XLA's GEMM fusions measured at 62-77 TFLOP/s while a standalone
large dot reaches 163 TFLOP/s on the same chip. This kernel runs the
whole chain per row-block with the FF weights resident in VMEM:

- both GEMMs hit the MXU back-to-back with fp32 accumulation and no HBM
  intermediate (the (bm, 2I) up-projection lives only in VMEM);
- LN (fp32 stats) and the erf-gelu gate run on the VPU between them;
- the residual add rides the final store, so the op reads each token row
  once and writes it once.

Numerics mirror the unfused path exactly: LN stats/affine in fp32 ->
bf16; up-projection rounded to bf16 before the gate (jnp.dot semantics);
gelu exact (erf) in fp32; down-projection in bf16 with bf16 bias;
residual added in bf16. Parity-tested in tests/test_ffn_kernel.py.

Two layouts:
- nsc: x viewed as (R, C) row-major blocks.
- snc: x is the (S, N, C) logical transpose of an (N, S, C) token tensor
  — same trick as ops/groupnorm.py::_gn_pallas_snc — so custom-call
  operands/results bitcast against XLA's conv-activation layout instead
  of relayout-copying (the spatial transformer's FF sits between two
  1x1 convs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# weights + double-buffered blocks + fp32 temporaries must fit
_VMEM_BUDGET = 80 * 1024 * 1024


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation of erf (fp32,
    max abs error 1.5e-7 — far below the bf16 rounding of the result).
    Mosaic has no erf/erfc lowering, so exact-gelu needs this."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    # exp(-x^2) via the native pow2
    e = jnp.exp2(-(ax * ax) * 1.4426950408889634)
    return s * (1.0 - poly * e)


def _gelu_exact(x):
    """x * Phi(x) with the erf above (matches jax.nn.gelu approximate=False
    to ~1e-7, i.e. exactly after the bf16 round)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ff_block(xa, scale_ref, bias_ref, wu_ref, bu_ref, wd_ref, bd_ref,
              eps: float, out_dtype):
    """(rows, C) fp32 -> (rows, C) out_dtype: LN -> GEGLU FF -> +residual."""
    c = jnp.float32(xa.shape[1])
    mean = jnp.sum(xa, axis=1, keepdims=True) / c
    var = jnp.sum(xa * xa, axis=1, keepdims=True) / c - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    ln = ((xa - mean) * inv * scale_ref[:].astype(jnp.float32)
          + bias_ref[:].astype(jnp.float32)).astype(out_dtype)

    up = jax.lax.dot_general(
        ln, wu_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)
    up = up + bu_ref[:]
    inner = wd_ref.shape[0]
    h = up[:, :inner]
    gate = up[:, inner:]
    g = _gelu_exact(gate.astype(jnp.float32))
    h = h * g.astype(out_dtype)

    y = jax.lax.dot_general(
        h, wd_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)
    return y + bd_ref[:] + xa.astype(out_dtype)


def _ffn_nsc_kernel(x_ref, scale_ref, bias_ref, wu_ref, bu_ref, wd_ref,
                    bd_ref, out_ref, *, eps: float):
    xa = x_ref[:].astype(jnp.float32)                   # (bm, C)
    out_ref[:] = _ff_block(xa, scale_ref, bias_ref, wu_ref, bu_ref,
                           wd_ref, bd_ref, eps, out_ref.dtype)


def _ffn_snc_kernel(x_ref, scale_ref, bias_ref, wu_ref, bu_ref, wd_ref,
                    bd_ref, out_ref, *, eps: float):
    bs, n, c = x_ref.shape
    xa = x_ref[:].reshape(bs * n, c).astype(jnp.float32)
    y = _ff_block(xa, scale_ref, bias_ref, wu_ref, bu_ref, wd_ref,
                  bd_ref, eps, out_ref.dtype)
    out_ref[:] = y.reshape(bs, n, c)


def _budget_ok(c: int, inner: int, bm: int, itemsize: int) -> bool:
    weights = (c * 2 * inner + inner * c) * itemsize
    blocks = 4 * bm * c * itemsize                       # in+out, 2x buffered
    temps = bm * 2 * inner * (4 + itemsize) + bm * inner * (4 + itemsize)
    return weights + blocks + temps <= _VMEM_BUDGET


_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=100 * 1024 * 1024)


def _floor8(x: int) -> int:
    """Largest 8-multiple <= x (callers guard x >= 8). Row blocks must be
    FLOORED, never ceiled: a block strictly larger than the array extent
    makes the edge-block DMA read past the allocation (the documented
    TPU-worker crash mode); a block smaller than a ragged extent is fine —
    the grid's partial edge block handles the tail."""
    return x // 8 * 8


def _pick_bm(r: int, c: int, inner: int, itemsize: int) -> int:
    """Row block for the 2-D (row-major) FF kernel. Swept on v5e
    (tools/sweep_ffn_blocks.py, round 4): FLAT at lvl0 (256-1536 all
    within 1% of 512) and 1024 REGRESSES lvl1 (7.43->8.05 ms) — the
    round-2 512 stands. Never exceed the array extent (block > extent
    makes the edge-block DMA read past the allocation — the documented
    TPU-worker crash mode)."""
    bm = min(512, _floor8(r))
    while bm > 8 and not _budget_ok(c, inner, bm, itemsize):
        bm //= 2
    return bm


@functools.partial(jax.jit, static_argnames=("eps", "bm"))
def _ffn_pallas_nsc(x2d, scale, bias, wu, bu, wd, bd, eps: float,
                    bm: int = 0):
    r, c = x2d.shape
    inner = wd.shape[0]
    # never let the block exceed the array extent: a block strictly larger
    # than the whole dimension makes the edge-block DMA read past the
    # array's allocation, which faults when the buffer sits at the end of
    # an HBM arena (observed as "TPU worker crashed" on the tiny-shape
    # reference UNet — allocation-layout dependent, so standalone repros
    # pass while the full program crashes)
    if bm:
        # sweep overrides must still respect the extent + VMEM invariants
        bm = min(bm, max(8, _floor8(r)))
        assert _budget_ok(c, inner, bm, x2d.dtype.itemsize), (
            f"bm={bm} over the VMEM budget for C={c}, inner={inner}")
    else:
        bm = _pick_bm(r, c, inner, x2d.dtype.itemsize)
    nblk = -(-r // bm)
    return pl.pallas_call(
        functools.partial(_ffn_nsc_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        compiler_params=_PARAMS,
    )(x2d, scale.reshape(1, c), bias.reshape(1, c), wu,
      bu.reshape(1, 2 * inner), wd, bd.reshape(1, c))


@functools.partial(jax.jit, static_argnames=("eps", "bs"))
def _ffn_pallas_snc(x_t, scale, bias, wu, bu, wd, bd, eps: float,
                    bs: int = 0):
    s, n, c = x_t.shape
    inner = wd.shape[0]
    if bs:
        # sweep overrides must still respect the extent + VMEM invariants
        bs = min(bs, s)
        assert _budget_ok(c, inner, bs * n, x_t.dtype.itemsize), (
            f"bs={bs} over the VMEM budget for n={n}, C={c}, inner={inner}")
    else:
        # swept round 4 (tools/sweep_ffn_blocks.py): bs 5-32 flat at lvl0,
        # bs=16 regresses lvl1 (7.41->9.94 ms) — keep 512-row blocks
        bs = max(1, min(512 // n, s))   # block must not exceed the S extent
        while bs > 1 and not _budget_ok(c, inner, bs * n,
                                        x_t.dtype.itemsize):
            bs //= 2
    nblk = -(-s // bs)
    return pl.pallas_call(
        functools.partial(_ffn_snc_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bs, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x_t.shape, x_t.dtype),
        compiler_params=_PARAMS,
    )(x_t, scale.reshape(1, c), bias.reshape(1, c), wu,
      bu.reshape(1, 2 * inner), wd, bd.reshape(1, c))


def _qkv_ln_kernel(x_ref, scale_ref, bias_ref, w_ref, q_ref, k_ref, v_ref,
                   *, eps: float):
    """(bm, C) block -> LN (fp32) -> one (C, 3C) GEMM -> q/k/v outputs.
    Removes the LN stats pass and runs the projection at Pallas-GEMM rate
    (~130 vs ~70 TFLOP/s for XLA's fusion of the same dot)."""
    xa = x_ref[:].astype(jnp.float32)
    c = jnp.float32(xa.shape[1])
    mean = jnp.sum(xa, axis=1, keepdims=True) / c
    var = jnp.sum(xa * xa, axis=1, keepdims=True) / c - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    ln = ((xa - mean) * inv * scale_ref[:].astype(jnp.float32)
          + bias_ref[:].astype(jnp.float32)).astype(q_ref.dtype)
    out = jax.lax.dot_general(
        ln, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(q_ref.dtype)
    inner = q_ref.shape[1]
    q_ref[:] = out[:, :inner]
    k_ref[:] = out[:, inner:2 * inner]
    v_ref[:] = out[:, 2 * inner:]


@functools.partial(jax.jit, static_argnames=("eps",))
def _qkv_ln_pallas(x2d, scale, bias, w3, eps: float):
    r, c = x2d.shape
    inner = w3.shape[1] // 3
    bm = min(512, _floor8(r))
    nblk = -(-r // bm)
    out_sd = jax.ShapeDtypeStruct((r, inner), x2d.dtype)
    return pl.pallas_call(
        functools.partial(_qkv_ln_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 3 * inner), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((bm, inner), lambda i: (i, 0))] * 3,
        out_shape=[out_sd, out_sd, out_sd],
        compiler_params=_PARAMS,
    )(x2d, scale.reshape(1, c), bias.reshape(1, c), w3)


def _snc_block(s: int, n: int) -> int:
    """S-axis block for kernels whose NATURAL-layout operands are blocked
    (n, bs, ...): bs sits on the sublane axis there, so it must be an
    8-multiple (or divide S exactly so the edge write stays inside the
    8-padded allocation). Prefer a dividing 8-multiple near 512//n rows."""
    for bs in (32, 16, 8):
        if s % bs == 0:
            return bs
    return 8


def _qkv_ln_snc_kernel(x_ref, scale_ref, bias_ref, w_ref, q_ref, k_ref,
                       v_ref, *, eps: float):
    """Layout-converting fused LN+QKV: the input block is an (S, N, C)
    conv-layout slab (bitcasts against the proj_in conv's output — no XLA
    relayout), the q/k/v output blocks are natural (N, bs, inner) row-major
    (exactly what the flash kernel's operands require — no relayout on
    that side either). The transpose happens on the VMEM-resident result
    tile, where it is a register shuffle instead of an HBM round-trip."""
    bs, n, c = x_ref.shape
    xa = x_ref[:].reshape(bs * n, c).astype(jnp.float32)
    cf = jnp.float32(c)
    mean = jnp.sum(xa, axis=1, keepdims=True) / cf
    var = jnp.sum(xa * xa, axis=1, keepdims=True) / cf - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    ln = ((xa - mean) * inv * scale_ref[0].astype(jnp.float32)
          + bias_ref[0].astype(jnp.float32)).astype(q_ref.dtype)
    out = jax.lax.dot_general(
        ln, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(q_ref.dtype)
    inner = q_ref.shape[2]
    out = jnp.transpose(out.reshape(bs, n, 3 * inner), (1, 0, 2))
    q_ref[:] = out[:, :, :inner]
    k_ref[:] = out[:, :, inner:2 * inner]
    v_ref[:] = out[:, :, 2 * inner:]


@functools.partial(jax.jit, static_argnames=("eps",))
def _qkv_ln_pallas_snc(x_t, scale, bias, w3, eps: float):
    """x_t: (S, N, C) logical transpose of the token tensor (conv layout).
    Returns NATURAL (N, S, inner) q/k/v — see _qkv_ln_snc_kernel."""
    s, n, c = x_t.shape
    inner = w3.shape[1] // 3
    bs = _snc_block(s, n)
    nblk = -(-s // bs)
    out_sd = jax.ShapeDtypeStruct((n, s, inner), x_t.dtype)
    return pl.pallas_call(
        functools.partial(_qkv_ln_snc_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bs, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 3 * inner), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((n, bs, inner), lambda i: (0, i, 0))] * 3,
        out_shape=[out_sd, out_sd, out_sd],
        compiler_params=_PARAMS,
    )(x_t, scale.reshape(1, c), bias.reshape(1, c), w3)


def qkv_ln_fused(x: jnp.ndarray, ln_p, attn_p,
                 eps: float = 1e-5, snc: bool = False) -> Optional[tuple]:
    """(q, k, v) = to_{q,k,v}(LN(x)) over an (N, S, C) token tensor via a
    single fused kernel, or None when it doesn't apply (caller falls back
    to layer_norm + three linears). to_q/to_k/to_v must be bias-free
    (diffusers Attention convention — layers.mha_init).

    snc: x is already the (S, N, C) logical transpose (conv layout trick);
    outputs are NATURAL (N, S, inner) — the layout the flash kernel's
    operands need, so neither side of this call pays an XLA relayout."""
    if jax.default_backend() != "tpu":
        return None
    if any("bias" in attn_p[k] for k in ("to_q", "to_k", "to_v")):
        return None
    c = x.shape[-1]
    r = x.size // c
    if r < 8:
        return None
    w3 = jnp.concatenate([attn_p["to_q"]["kernel"],
                          attn_p["to_k"]["kernel"],
                          attn_p["to_v"]["kernel"]], axis=1).astype(x.dtype)
    if snc:
        assert x.ndim == 3
        return _qkv_ln_pallas_snc(x, ln_p["scale"], ln_p["bias"], w3, eps)
    q, k, v = _qkv_ln_pallas(x.reshape(r, c), ln_p["scale"], ln_p["bias"],
                             w3, eps)
    shape = x.shape[:-1] + (w3.shape[1] // 3,)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)


def _matmul_res_kernel(x_ref, w_ref, b_ref, res_ref, out_ref):
    y = jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)
    out_ref[:] = y + b_ref[:] + res_ref[:]


def _matmul_kernel(x_ref, w_ref, b_ref, out_ref):
    y = jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)
    out_ref[:] = y + b_ref[:]


@jax.jit
def _matmul_pallas(x2d, w, b):
    r, kdim = x2d.shape
    n = w.shape[1]
    bm = min(512, _floor8(r))
    nblk = -(-r // bm)
    return pl.pallas_call(
        _matmul_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bm, kdim), lambda i: (i, 0)),
            pl.BlockSpec((kdim, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, n), x2d.dtype),
        compiler_params=_PARAMS,
    )(x2d, w, b.reshape(1, n))


def matmul_bias(x: jnp.ndarray, lin_p,
                snc: bool = False) -> Optional[jnp.ndarray]:
    """linear(lin_p, x) as a resident-weight Pallas GEMM, or None (caller
    falls back to layers.linear). snc: x is a (S, N, K) logical transpose
    (conv layout trick)."""
    if jax.default_backend() != "tpu":
        return None
    kdim = x.shape[-1]
    r = x.size // kdim
    n = lin_p["kernel"].shape[1]
    if r < 8 or kdim * n * x.dtype.itemsize > 16 * 1024 * 1024:
        return None
    b = lin_p.get("bias")
    if b is None:
        b = jnp.zeros((n,), x.dtype)
    if snc:
        assert x.ndim == 3
        return _matmul_pallas_snc(x, lin_p["kernel"].astype(x.dtype),
                                  b.astype(x.dtype))
    y = _matmul_pallas(x.reshape(r, kdim), lin_p["kernel"].astype(x.dtype),
                       b.astype(x.dtype))
    return y.reshape(x.shape[:-1] + (n,))


@jax.jit
def _matmul_res_pallas(x2d, w, b, res2d):
    r, kdim = x2d.shape
    n = w.shape[1]
    bm = min(512, _floor8(r))
    nblk = -(-r // bm)
    return pl.pallas_call(
        _matmul_res_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bm, kdim), lambda i: (i, 0)),
            pl.BlockSpec((kdim, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, n), x2d.dtype),
        compiler_params=_PARAMS,
    )(x2d, w, b.reshape(1, n), res2d)


def _matmul_snc_kernel(x_ref, w_ref, b_ref, out_ref):
    bs, n, kdim = x_ref.shape
    y = jax.lax.dot_general(
        x_ref[:].reshape(bs * n, kdim), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)
    out_ref[:] = (y + b_ref[0]).reshape(bs, n, -1)


def _matmul_res_snc_kernel(x_ref, w_ref, b_ref, res_ref, out_ref):
    """Layout-converting out-projection+residual: x is a NATURAL
    (N, bs, K) block (the flash kernel's row-major output — no relayout),
    res/out are (S, N, C) conv-layout slabs (bitcast against the
    downstream conv). The transpose rides the VMEM tile."""
    n, bs, kdim = x_ref.shape
    xt = jnp.transpose(x_ref[:], (1, 0, 2)).reshape(bs * n, kdim)
    y = jax.lax.dot_general(
        xt, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)
    cout = out_ref.shape[2]
    out_ref[:] = (y + b_ref[0]).reshape(bs, n, cout) + res_ref[:]


@jax.jit
def _matmul_pallas_snc(x_t, w, b):
    s, nb, kdim = x_t.shape
    n = w.shape[1]
    bs = max(1, min(512 // nb, s))
    nblk = -(-s // bs)
    return pl.pallas_call(
        _matmul_snc_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((bs, nb, kdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((kdim, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, nb, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, nb, n), x_t.dtype),
        compiler_params=_PARAMS,
    )(x_t, w, b.reshape(1, n))


@jax.jit
def _matmul_res_pallas_snc(x, w, b, res_t):
    """x: NATURAL (N, S, K); res_t/result: (S, N, Cout) conv-layout
    logical transposes — see _matmul_res_snc_kernel."""
    nb, s, kdim = x.shape
    n = w.shape[1]
    bs = _snc_block(s, nb)
    nblk = -(-s // bs)
    return pl.pallas_call(
        _matmul_res_snc_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nb, bs, kdim), lambda i: (0, i, 0)),
            pl.BlockSpec((kdim, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((bs, nb, n), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, nb, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, nb, n), x.dtype),
        compiler_params=_PARAMS,
    )(x, w, b.reshape(1, n), res_t)


def matmul_bias_residual(x: jnp.ndarray, lin_p, res: jnp.ndarray,
                         snc: bool = False) -> Optional[jnp.ndarray]:
    """res + linear(lin_p, x) over (..., K) with the weight VMEM-resident
    (the attention out-projection + residual add; ~77 TFLOP/s as an XLA
    add_add fusion, ~130 as a Pallas GEMM). None -> caller falls back.

    snc: x is NATURAL (N, S, K) (the flash kernel's row-major output);
    res and the result are (S, N, Cout) logical transposes (conv layout
    trick) — the kernel converts layout on the VMEM tile so neither the
    attention side nor the conv side pays an XLA relayout."""
    if jax.default_backend() != "tpu":
        return None
    kdim = x.shape[-1]
    r = x.size // kdim
    n = lin_p["kernel"].shape[1]
    if r < 8 or kdim * n * x.dtype.itemsize > 16 * 1024 * 1024:
        return None
    b = lin_p.get("bias")
    if b is None:
        b = jnp.zeros((n,), x.dtype)
    if snc:
        assert x.ndim == 3 and res.ndim == 3
        return _matmul_res_pallas_snc(x, lin_p["kernel"].astype(x.dtype),
                                      b.astype(x.dtype), res)
    y = _matmul_res_pallas(x.reshape(r, kdim),
                           lin_p["kernel"].astype(x.dtype),
                           b.astype(x.dtype), res.reshape(r, n))
    return y.reshape(res.shape)


def ffn_ln_geglu_fused(x: jnp.ndarray, ln_p, ff_p, eps: float = 1e-5,
                       snc: bool = False,
                       pre_transposed: bool = False) -> Optional[jnp.ndarray]:
    """x + proj_out(geglu(proj_in(LN(x)))) over the trailing axis of an
    (N, S, C) / (..., C) tensor, or None when the kernel doesn't apply
    (caller falls back to the XLA path).

    ln_p: {scale, bias}; ff_p: {proj_in: {kernel, bias},
    proj_out: {kernel, bias}} (layers.geglu_ff_init layout).
    snc: route through the (S, N, C)-layout kernel (conv-layout trick).
    With pre_transposed, x IS the transpose already (same convention as
    qkv_ln_fused/matmul_bias) and the result stays transposed; otherwise
    x is natural (N, S, C) and the transposes happen here (XLA folds them
    into the surrounding layout assignment).
    """
    if jax.default_backend() != "tpu":
        return None
    c = x.shape[-1]
    inner = ff_p["proj_out"]["kernel"].shape[0]
    if not _budget_ok(c, inner, 8, x.dtype.itemsize):
        return None                                     # weights alone too big
    wu = ff_p["proj_in"]["kernel"].astype(x.dtype)
    bu = ff_p["proj_in"]["bias"].astype(x.dtype)
    wd = ff_p["proj_out"]["kernel"].astype(x.dtype)
    bd = ff_p["proj_out"]["bias"].astype(x.dtype)
    if snc and x.ndim == 3:
        if pre_transposed:
            return _ffn_pallas_snc(x, ln_p["scale"], ln_p["bias"], wu, bu,
                                   wd, bd, eps)
        y = _ffn_pallas_snc(jnp.transpose(x, (1, 0, 2)), ln_p["scale"],
                            ln_p["bias"], wu, bu, wd, bd, eps)
        return jnp.transpose(y, (1, 0, 2))
    r = x.size // c
    if r < 8:
        return None
    y = _ffn_pallas_nsc(x.reshape(r, c), ln_p["scale"], ln_p["bias"], wu,
                        bu, wd, bd, eps)
    return y.reshape(x.shape)
