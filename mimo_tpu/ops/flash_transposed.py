"""Transposed-layout Pallas flash attention for small head_dim.

Why: MIMO's spatial attention has head_dim 40 (SD1.5 320ch / 8 heads at the
top level). In the standard (B, H, S, d) layout both flash matmuls pad d to
128 lanes — QK^T contracts over d (40/128 of the MXU's K rows active) and
PV emits (bq, d) output tiles (40/128 of the N columns active) — capping
throughput at ~31% of peak (measured ~33 TFLOP/s on v5e, BENCH_NOTES.md).

This kernel stores Q/K/V transposed as (BH, d, S), so:
- logits^T = Kt^T·contract(d)·Qt has shape (bk, bq): both output dims are
  large; the contraction is d padded only to the SUBLANE granularity
  (40 -> 48 in bf16, not 128);
- out^T = Vt·contract(bk)·P^T has shape (d, bq): the contraction is the
  large key-block dim, fully utilizing the MXU; d lands on sublanes;
- per-query softmax statistics are (1, bq) lane vectors (reductions over
  the sublane axis of the (bk, bq) logits), and the accumulator rescale is
  a natural lane-broadcast over the (d, bq) accumulator.

The surrounding (B,H,S,d) <-> (BH,d,S) transposes are plain XLA copies
(~1 GB of HBM traffic for the hot shape, ~1 ms — negligible vs the 670 ms
attention share they attack).

Reference semantics: scaled dot-product attention with online softmax, no
masking except key-length padding — exact, validated against
jax.nn.dot_product_attention in tests/test_ops.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_t_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref,
                    *, sk_actual: int, block_k: int, out_dtype):
    """One (batch*head, q-block, k-block) grid step.

    q_ref: (1, d, bq); k_ref: (1, d, bk); v_ref: (1, d+1, bk) — values plus
    a ones-row whose PV product is the running softmax denominator;
    o_ref: (1, d, bq). Scratch: acc (d+1, bq) f32, m (1, bq) f32. Grid
    iterates k innermost, so scratch accumulates across the k blocks of
    one q block.
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qt = q_ref[0]                    # (d, bq)
    kt = k_ref[0]                    # (d, bk)

    # logits^T: (bk, bq) — contract over d (sublane-padded, not lane-padded)
    s = jax.lax.dot_general(
        kt, qt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if sk_actual % block_k != 0:
        # mask padded key rows (zero-padded keys would score 0, not -inf)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(rows + j * block_k < sk_actual, s, NEG_INF)

    # logits arrive pre-scaled by log2(e)·sm_scale, so the softmax runs in
    # the exp2 domain (native VPU pow2; saves a multiply per element)
    m_prev = m_ref[:]                                   # (1, bq)
    m_cur = jnp.max(s, axis=0, keepdims=True)           # (1, bq)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)                    # (1, bq)
    p = jnp.exp2(s - m_new)                             # (bk, bq) f32
    m_ref[:] = m_new

    # v arrives with a ones-row appended (d rows of values + 1 of ones), so
    # the PV matmul also produces sum(p) — the l statistic rides the MXU
    # (d pads 40 -> 48 sublanes anyway; the extra row is free)
    vt = v_ref[0]                    # (d+1, bk)
    pv = jax.lax.dot_general(
        vt, p.astype(vt.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _emit():
        acc = acc_ref[:]
        o_ref[0] = (acc[:-1] / acc[-1:]).astype(out_dtype)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "sm_scale"))
def flash_attention_t(qt: jnp.ndarray, kt: jnp.ndarray, vt: jnp.ndarray,
                      sm_scale: float, block_q: int = 512,
                      block_k: int = 1024) -> jnp.ndarray:
    """qt: (BH, d, Sq), kt/vt: (BH, d, Sk) — head_dim on the sublane axis.
    Returns (BH, d, Sq). Sq/Sk are zero-padded to block multiples here;
    padded queries produce garbage columns the caller slices off, padded
    keys are masked to -inf inside the kernel."""
    bh, d, sq = qt.shape
    sk = kt.shape[2]
    sq_p = _ceil_to(sq, block_q)
    sk_p = _ceil_to(sk, block_k)
    if sq_p != sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_p - sq)))
    if sk_p != sk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk_p - sk)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk_p - sk)))
    # fold the softmax scale AND log2(e) into q: the kernel softmax runs in
    # the exp2 domain (exp(x) == exp2(x * log2 e))
    qt = qt * jnp.asarray(sm_scale * 1.4426950408889634, qt.dtype)
    # ones-row rides along v so the PV matmul computes sum(p) too
    vt = jnp.concatenate(
        [vt, jnp.ones((bh, 1, sk_p), vt.dtype)], axis=1)

    grid = (bh, sq_p // block_q, sk_p // block_k)
    kernel = functools.partial(
        _flash_t_kernel, sk_actual=sk, block_k=block_k, out_dtype=qt.dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, d, block_k), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, d + 1, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((bh, d, sq_p), qt.dtype),
        scratch_shapes=[
            pltpu.VMEM((d + 1, block_q), jnp.float32),
            pltpu.VMEM((1, block_q), jnp.float32),
        ],
    )(qt, kt, vt)
    return out[:, :, :sq]


def flash_sdpa_t(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 heads: int, block_q: int = 512,
                 block_k: int = 1024) -> jnp.ndarray:
    """(B, Sq, inner) x (B, Sk, inner) -> (B, Sq, inner), numerics matching
    jax.nn.dot_product_attention (scale 1/sqrt(d))."""
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads

    def to_bhds(x):
        s = x.shape[1]
        return x.reshape(b, s, heads, d).transpose(0, 2, 3, 1) \
            .reshape(b * heads, d, s)

    qt, kt, vt = to_bhds(q), to_bhds(k), to_bhds(v)
    ot = flash_attention_t(qt, kt, vt, sm_scale=1.0 / math.sqrt(d),
                           block_q=block_q, block_k=block_k)
    return ot.reshape(b, heads, d, sq).transpose(0, 3, 1, 2) \
        .reshape(b, sq, inner)
