"""Fused Pallas temporal attention for the motion modules.

The motion module attends over the frame axis (F ≤ 32) at every spatial
location — per (batch, head, s): an F×F attention. The XLA einsum path
materializes the (B, H, F, F, S) logits in HBM and, worse, assigns the
softmax intermediates a layout with F on the minor (lane) axis, padding
24 → 128 lanes (5.3×): profiled at ~150-185 ms/denoise-step across the
logits matmuls, softmax fusions, bf16 converts, and relayout copies
(BENCH_NOTES.md round 2).

This kernel keeps everything in VMEM per (batch, s-block) grid step and
fuses the whole attention op:

- q/k/v projections as (C,C)·(C, F·bs) MXU matmuls on the transposed
  block (contraction over C on sublanes, N = F·bs lanes — fully utilized);
- the F×F logits by ROTATION instead of gather: the transposed block's
  lane axis is frame-major (f·bs + j), so `roll(kt, -r·bs, lanes)` aligns
  every query frame f with key frame (f+r) mod F. F full-width
  multiply + per-head segmented sublane reduces produce the logits for
  diagonal r of every head at once — no unaligned slicing, no tiling;
- softmax over the rotation axis on an (F, H, F·bs) fp32 value (s stays
  on lanes — nothing pads);
- PV as F rolled FMA accumulations, all heads at once;
- the output projection (+bias) on the MXU.

The only in-kernel transposes are one (F·bs, C) -> (C, F·bs) of the input
block and one of the output. HBM traffic: 1 read of x, 1 write of the
result — versus ~10 full-tensor round trips (q/k/v/out projections, fp32
logits, softmax, converts) on the XLA path.

Numerics match the einsum path (fp32 logits/softmax, bf16 PV operand) —
validated in tests/test_temporal_attention.py (interpret mode, rolled
indexing against a numpy oracle).

Reference semantics: AnimateDiff VersatileAttention temporal mode
(/root/reference/src/models/motion_module.py:146-184,361-374).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block-dependent working-set budget (measured optimum: bigger blocks
# REGRESS — c=320 bs=32 runs 5.2 ms/call vs 5.9 at bs~112). Weights are
# budgeted separately so c=1280 modules still fit under the raised
# 100 MB scoped-VMEM limit instead of falling back to the einsum path.
_VMEM_BUDGET = 9 * 1024 * 1024
_VMEM_TOTAL = 64 * 1024 * 1024


def _tattn_kernel(x_ref, scale_ref, bias_ref, pe_ref,
                  wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref,
                  *, frames: int, heads: int, out_dtype, ln: bool,
                  residual: bool, eps: float = 1e-5):
    """One (batch, s-block) grid step: full temporal attention of all
    frames/heads for a block of spatial positions.

    x_ref/o_ref: (1, F, bs, C); weights: (C, C); bo: (1, C).
    ln=True folds the pre-attention LayerNorm (fp32 stats) and the
    sinusoidal PE add (pe_ref (F, C), added to the NORMED states —
    reference motion_module.py:361-368) into the same pass; residual=True
    adds the raw input block to the output (the module-level skip), so
    the whole `x + attn(LN(x)+pe)` chain is one HBM read + one write.
    """
    f = frames
    _, _, bs, c = x_ref.shape
    d = c // heads
    fbs = f * bs

    x_in = x_ref[0].reshape(fbs, c)                      # (F·bs, C)
    if ln:
        # LN on the 3-D (F, bs, C) view: rank-expanding reshapes/broadcasts
        # are unsupported Mosaic shape casts, so scale/bias/pe arrive as
        # 3-D operands ((1,1,C)/(F,1,C)) and dims merge only afterwards
        xa = x_ref[0].astype(jnp.float32)                # (F, bs, C)
        cf = jnp.float32(c)
        mean = jnp.sum(xa, axis=2, keepdims=True) / cf
        var = jnp.sum(xa * xa, axis=2, keepdims=True) / cf - mean * mean
        inv_s = jax.lax.rsqrt(var + eps)
        normed = ((xa - mean) * inv_s * scale_ref[:].astype(jnp.float32)
                  + bias_ref[:].astype(jnp.float32)).astype(x_in.dtype)
        normed = normed + jnp.broadcast_to(pe_ref[:], (f, bs, c))
        xt = normed.reshape(fbs, c).T                    # (C, F·bs)
    else:
        xt = x_in.T                                      # (C, F·bs)

    # projections: contraction over C rides the MXU at full utilization
    # (fp32 accumulation, results kept in the input dtype); the softmax
    # scale and log2(e) fold into q (exp2-domain softmax)
    def proj(w_ref):
        y = jax.lax.dot_general(
            w_ref[:], xt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(xt.dtype)

    qt = proj(wq_ref) * jnp.asarray(1.4426950408889634 / math.sqrt(d),
                                    xt.dtype)
    kt = proj(wk_ref)
    vt = proj(wv_ref)

    # logits by rotation: diagonal r pairs query frame f with key frame
    # (f+r) mod F. One multiply + per-head segmented reduce per r, all
    # heads at once. The softmax over r is unrolled on the F-long list of
    # (H, F·bs) fp32 values — everything stays 2D (Mosaic rejects the
    # equivalent 3D-stacked softmax in this context).
    logits = []
    for r in range(f):
        # r == 0 skips the roll: Mosaic rejects the zero-width slice inside
        # jnp.roll's concatenate lowering
        ktr = kt if r == 0 else jnp.roll(kt, -r * bs, axis=1)
        prod = (qt * ktr).astype(jnp.float32)
        lr = jnp.sum(prod.reshape(heads, d, fbs), axis=1)      # (H, F·bs)
        logits.append(lr)

    m = functools.reduce(jnp.maximum, logits)                  # (H, F·bs)
    ps = [jnp.exp2(lr - m) for lr in logits]
    inv = 1.0 / functools.reduce(lambda a, b: a + b, ps)

    # PV: o = sum_r w_r * roll(v, -r); each head's weight row broadcasts
    # over its d sublanes so all heads accumulate together
    acc = jnp.zeros((c, fbs), jnp.float32)
    for r in range(f):
        vtr = vt if r == 0 else jnp.roll(vt, -r * bs, axis=1)
        wr = jnp.broadcast_to((ps[r] * inv)[:, None, :],
                              (heads, d, fbs)).reshape(c, fbs)
        acc = acc + wr * vtr.astype(jnp.float32)

    out_t = jax.lax.dot_general(
        wo_ref[:], acc.astype(xt.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (C, F·bs)
    out_t = out_t + bo_ref[0].astype(jnp.float32)[:, None]
    out = out_t.T.astype(out_dtype)
    if residual:
        out = out + x_in.astype(out_dtype)
    o_ref[0] = out.reshape(f, bs, c)


def _pick_bs(s: int, c: int, frames: int, itemsize: int) -> int:
    """Largest multiple-of-8 s-block whose working set fits VMEM: the floor
    is ~6 full-width (C, F·bs) values (x, q, k, v, acc, out) plus rolled
    temporaries and the fp32 logits."""
    heads_bytes = frames * (4 + itemsize)     # logits + weights rows per s

    weights = 4 * c * c * itemsize

    def cost(bs):
        fbs = frames * bs
        full_width = c * fbs
        blocks = 4 * full_width * itemsize                # x/out double-buf
        live = 4 * full_width * itemsize                  # xt, q, k, v
        acc = full_width * 4
        temps = 3 * full_width * itemsize                 # rolls/products
        logits = heads_bytes * fbs * 8 // 8               # ~(F,H,F·bs)
        return blocks + live + acc + temps + logits

    # bs = 128 makes every in-kernel lane roll a whole-vreg move
    # (r·bs % 128 == 0 — no cross-lane shuffles): measured 10.3 -> 8.7
    # ms/call on the lvl0 step shape (tools/tune_temporal.py, round 3).
    # Requires s % 128 == 0 — the ragged edge block would otherwise DMA
    # past the 8-padded sublane allocation (S is the sublane axis here).
    if s % 128 == 0 and cost(128) <= 26 * 1024 * 1024 \
            and cost(128) + weights <= _VMEM_TOTAL:
        return 128
    # F·bs must be a whole number of 128-lane vregs so the in-kernel lane
    # rolls stay within the real (unpadded) lane extent
    step = 128 // math.gcd(frames, 128)
    step = max(step, 8)
    # FLOOR to the step multiple — a block exceeding the whole S extent
    # DMAs past the allocation (the documented TPU-worker crash mode).
    # s % bs ragged tails are fine: every lane column is independent in
    # this kernel (LN/logits/softmax/PV are all per-(f,s) column), so the
    # partial edge block's pad columns never contaminate valid ones.
    bs = min(512, s // step * step)
    if bs == 0:
        return 0                       # S too small for a lane-aligned block
    while bs > step and cost(bs) > _VMEM_BUDGET:
        bs -= step
    # over-budget at the minimum block (c=1280): still use the kernel if
    # the total working set fits the raised scoped-VMEM limit — measured
    # better than the XLA einsum fallback (fusion bucket −23 ms/step)
    if cost(bs) + weights > _VMEM_TOTAL:
        return 0
    return bs


@functools.partial(jax.jit, static_argnames=("frames", "heads", "ln",
                                             "residual", "bs_override"))
def temporal_attention_fused(x: jnp.ndarray, scale, bias, pe,
                             wq, wk, wv, wo, bo,
                             frames: int, heads: int, ln: bool,
                             residual: bool,
                             bs_override: int = 0) -> jnp.ndarray:
    """x: (B, F, S, C). With ln=False, x must be pre-normed with the PE
    already added and the result is to_out(attend(x)) (caller adds the
    residual). With ln=True the kernel computes
    [x +] to_out(attend(LN(x) + pe)) itself — scale/bias (C,), pe (F, C).
    """
    b, f, s, c = x.shape
    assert f == frames
    bs = bs_override or _pick_bs(s, c, frames, x.dtype.itemsize)
    assert bs > 0, "caller must gate on _applies (which checks _pick_bs)"
    grid = (b, -(-s // bs))
    kernel = functools.partial(_tattn_kernel, frames=frames, heads=heads,
                               out_dtype=x.dtype, ln=ln, residual=residual)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f, bs, c), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((f, 1, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, bs, c), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, scale.reshape(1, 1, c), bias.reshape(1, 1, c),
      pe.reshape(f, 1, c), wq, wk, wv, wo, bo.reshape(1, c))


def _applies(p_attn, x, frames: int, heads: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    c = x.shape[-1]
    if c % heads or (c // heads) % 8:
        return False
    if "bias" in p_attn["to_q"]:          # kernel assumes bias-free qkv
        return False
    if _pick_bs(x.shape[2], c, frames, x.dtype.itemsize) == 0:
        return False                       # working set can't fit VMEM
    return True


def _weights(p_attn, c, dtype):
    return (p_attn["to_q"]["kernel"], p_attn["to_k"]["kernel"],
            p_attn["to_v"]["kernel"], p_attn["to_out"]["kernel"],
            p_attn["to_out"].get("bias", jnp.zeros((c,), dtype)))


def temporal_attention(p_attn, x_norm: jnp.ndarray, frames: int,
                       heads: int):
    """Dispatch (pre-normed input): fused Pallas kernel on TPU, None
    otherwise (caller falls back to the einsum formulation)."""
    if not _applies(p_attn, x_norm, frames, heads):
        return None
    c = x_norm.shape[-1]
    z = jnp.zeros((c,), x_norm.dtype)
    return temporal_attention_fused(
        x_norm, z, z, jnp.zeros((frames, c), x_norm.dtype),
        *_weights(p_attn, c, x_norm.dtype),
        frames=frames, heads=heads, ln=False, residual=False)


def temporal_attention_ln(p_attn, ln_p, pe: jnp.ndarray, x: jnp.ndarray,
                          frames: int, heads: int):
    """Dispatch for the full `x + attn(LN(x) + pe)` chain fused in one
    kernel (x raw tokens, pe (F, C)). Returns None when the kernel does
    not apply — the caller runs the layer_norm/einsum fallback."""
    if not _applies(p_attn, x, frames, heads):
        return None
    c = x.shape[-1]
    return temporal_attention_fused(
        x, ln_p["scale"], ln_p["bias"], pe.astype(x.dtype),
        *_weights(p_attn, c, x.dtype),
        frames=frames, heads=heads, ln=True, residual=True)
