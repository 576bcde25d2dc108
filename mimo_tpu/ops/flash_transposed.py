"""Transposed-compute Pallas flash attention for small head_dim, consuming
the natural (B, S, H·d) layout directly.

Why transposed compute: MIMO's spatial attention has head_dim 40 (SD1.5
320ch / 8 heads at the top level). In the standard (B, H, S, d) layout both
flash matmuls pad d to 128 lanes — QK^T contracts over d (40/128 of the
MXU's K rows active) and PV emits (bq, d) output tiles (40/128 of the N
columns active) — capping throughput at ~31% of peak (measured ~33 TFLOP/s
on v5e, BENCH_NOTES.md). Computing with d on the SUBLANE axis instead:
- logits^T = Kt^T·contract(d)·Qt has shape (bk, bq): both output dims are
  large; the contraction is d padded only to the sublane granularity;
- out^T = Vt·contract(bk)·P^T has shape (d, bq): the contraction is the
  large key-block dim, fully utilizing the MXU;
- per-query softmax statistics are (1, bq) lane vectors and the accumulator
  rescale is a natural lane-broadcast.

Why natural input layout: the first kernel generation took (BH, d, S)
operands and left the (B, S, H·d) -> (BH, d, S) relayout to XLA — profiled
at ~150 ms/denoise-step of %copy (those transposes run ~100 GB/s in HBM).
This kernel reads (1, bq|bk, H·d) blocks of the model's activations
unchanged, transposes each block ONCE in VMEM to (H·d, bq|bk), and unrolls
the heads statically inside the kernel — each head's (d, ·) panel is an
aligned sublane slice of the transposed block. No HBM-level relayout
exists on either side, and K/V blocks are fetched once per q-block for all
heads rather than once per head.

Reference semantics: scaled dot-product attention with online softmax, no
masking except key-length padding — exact, validated against a numpy
oracle in tests/test_ops.py (interpret mode).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_nt_kernel(q_ref, k_ref, v_ref, o_ref, qt_ref, acc_ref, m_ref,
                     l_ref, qn_ref, *, heads: int, sk_actual: int,
                     block_k: int, sm_scale: float, out_dtype):
    """One (batch, q-block, k-block) grid step, all heads unrolled.

    q_ref/o_ref: (1, bq, H·d); k_ref/v_ref: (1, bk, H·d) — natural
    sequence-major blocks. Scratch: qt (H·(d+8), bq) input dtype (the
    transposed q in per-head panels — see below), acc (H·d, bq) f32,
    m/l/qn (heads, bq) f32. Grid iterates k innermost; scratch
    accumulates across the k blocks of one q block.

    Bound-shift softmax (round 3): the per-logit VPU chain used to be
    max-reduce + subtract + exp2 over the (bk, bq) tile — the measured
    wall of the whole kernel (BENCH_NOTES.md: VPU-softmax-bound, the DMA
    and MXU fully hidden). Two changes remove 2 of the 3 passes:

    - the running shift m is an UPPER BOUND instead of the true max:
      ‖q̃_col‖·max_rows‖k̃‖ (Cauchy-Schwarz on the bf16-rounded operands,
      O(d·bk) per block instead of O(bk·bq)). Softmax is shift-invariant
      for ANY shift ≥ max (p stays ≤ ~1), so the result is unchanged;
    - the subtraction rides the QK matmul: each head's q panel carries
      d+8 rows — d of q, one holding −m̃ (rewritten per k block), 7 zeros
      for sublane alignment — and the matching k panel [k; ones; zeros]
      makes the MXU emit s − m̃ directly. d+8 = 48 for the d=40 heads,
      exactly the sublane padding the MXU applied anyway — the extra
      contraction rows are free.

    The shift actually applied is the bf16-rounded row value, so m̃ is
    stored rounded too — alpha, the denominator, and the final division
    all use the identical shift and exactness is preserved. Failure
    envelope: if the C-S bound overshoots the true max by > ~126 (exp2
    domain), every p underflows to 0 and the row returns NaN — requires
    ‖q‖‖k‖ ≫ any realized logit, far outside LN-normalized attention;
    the true-max kernel had the mirror-image overflow envelope.

    A "global shift" variant (shift precomputed over the whole key
    sequence outside the kernel, constant across k blocks) was built in
    round 4 and DELETED in round 5 after losing every A/B: in-program
    synthesis step 0.890→0.898 s (round 4), isolated lvl0/lvl1 losses
    (tune_flash.py round 5), and decomp ViT shapes flat-to-worse
    (hiera 5.36→5.30/2.92→2.87, depth-vitl 4.43→4.82 ms). The ablation
    study (tools/ablate_flash.py) explains why it could never win: the
    per-block softmax-state passes it removed cost ~0.5 ms/call — the
    kernel is VMEM-bandwidth-bound on the logit tiles (12 B/logit),
    not VPU-bound (BENCH_NOTES.md round 5).
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    hd = q_ref.shape[2]
    d = hd // heads
    dp = d + 8                                          # per-head panel rows
    bq = q_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # fold softmax scale and log2(e) into q once; softmax runs in the
        # exp2 domain (native VPU pow2)
        qt = (q_ref[0].T
              * jnp.asarray(sm_scale * 1.4426950408889634, q_ref.dtype))
        for h in range(heads):
            qh = qt[h * d:(h + 1) * d]                  # (d, bq)
            qt_ref[h * dp:h * dp + d] = qh
            qt_ref[h * dp + d:(h + 1) * dp] = jnp.zeros((8, bq), qt.dtype)
            qn_ref[h:h + 1] = jnp.sqrt(jnp.sum(
                qh.astype(jnp.float32) ** 2, axis=0, keepdims=True))
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)

    ragged = sk_actual % block_k != 0
    kt = k_ref[0].T                                     # (H·d, bk)
    v = v_ref[0]                                        # (bk, H·d)
    if ragged:
        # zero value rows beyond the true key length (edge blocks are read
        # as-is from VMEM and may contain garbage; p is 0 there but
        # 0 * inf/NaN = NaN)
        rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(rows + j * block_k < sk_actual, v, 0)
    vt = v.T                                            # (H·d, bk)
    bk = kt.shape[1]

    def _shift(h):
        """Update the running bound and write the shift row for head h.
        Returns (m_prev, m_new) — both already rounded to the row dtype
        so every use of the shift is consistent. Per-block path only."""
        sl = slice(h * d, (h + 1) * d)
        kn2 = jnp.sum(kt[sl].astype(jnp.float32) ** 2, axis=0,
                      keepdims=True)                    # (1, bk)
        if ragged:
            cols = jax.lax.broadcasted_iota(jnp.int32, kn2.shape, 1)
            kn2 = jnp.where(cols + j * block_k < sk_actual, kn2, 0)
        knmax = jnp.sqrt(jnp.max(kn2, axis=1, keepdims=True))   # (1, 1)
        m_prev = m_ref[h:h + 1]                         # (1, bq) rounded
        bound = qn_ref[h:h + 1] * knmax
        row = (-jnp.maximum(m_prev, bound)).astype(qt_ref.dtype)
        qt_ref[h * dp + d:h * dp + d + 1] = row
        m_new = -row.astype(jnp.float32)                # the applied shift
        m_ref[h:h + 1] = m_new
        return m_prev, m_new

    def _qk(h):
        # logits^T − m̃: (bk, bq) — contract over the d+8 panel rows; the
        # ones row pairs with −m̃, the zero rows contribute nothing
        ktp = jnp.concatenate(
            [kt[h * d:(h + 1) * d], jnp.ones((1, bk), kt.dtype),
             jnp.zeros((7, bk), kt.dtype)])             # (d+8, bk)
        s = jax.lax.dot_general(
            ktp, qt_ref[h * dp:(h + 1) * dp],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if ragged:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(rows + j * block_k < sk_actual, s, NEG_INF)
        return s

    # software-pipelined heads: head h+1's QK matmul is issued before head
    # h's softmax so the two never serialize on a data dependency
    ms_next = _shift(0)
    s_next = _qk(0)
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        m_prev, m_new = ms_next
        s = s_next
        if h + 1 < heads:
            ms_next = _shift(h + 1)
            s_next = _qk(h + 1)

        alpha = jnp.exp2(m_prev - m_new)            # (1, bq)
        # exp2 in the PV-operand dtype: the matmul rounds p to bf16
        # anyway and bf16 exp2 doubles VPU throughput on the biggest
        # block tensor
        p = jnp.exp2(s.astype(vt.dtype))            # (bk, bq), ≤ ~1
        # ones-row appended to V: the PV matmul emits the softmax
        # denominator as its last row with fp32 MXU accumulation (free
        # — d pads to the next sublane multiple regardless)
        vt_plus = jnp.concatenate(
            [vt[sl], jnp.ones((1, vt.shape[1]), vt.dtype)])
        pv = jax.lax.dot_general(
            vt_plus, p,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (d+1, bq)
        acc_ref[sl] = acc_ref[sl] * alpha + pv[:-1]
        l_ref[h:h + 1] = l_ref[h:h + 1] * alpha + pv[-1:]

    @pl.when(j == nk - 1)
    def _emit():
        ot = jnp.concatenate(
            [acc_ref[h * d:(h + 1) * d] / l_ref[h:h + 1]
             for h in range(heads)], axis=0)            # (H·d, bq)
        o_ref[0] = ot.T.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "block_k",
                                             "sm_scale", "batch_start",
                                             "batch_count"))
def flash_attention_nt(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       heads: int, sm_scale: float, block_q: int = 256,
                       block_k: int = 1024, batch_start: int = 0,
                       batch_count: int = 0) -> jnp.ndarray:
    """q: (B, Sq, H·d), k/v: (B, Sk, H·d) -> (Bc, Sq, H·d). Sq may be any
    length (edge q blocks compute garbage columns that are never stored);
    Sk is masked in-kernel when not a block multiple.

    batch_start/batch_count select a batch window [start, start+count) via
    the index maps: Pallas operands must be whole arrays, so slicing the
    CFG halves outside the call materializes ~16 ms/step of %slice copies
    — the offset reads the halves in place instead."""
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads
    bc = batch_count or b
    bo = batch_start

    grid = (bc, -(-sq // block_q), -(-sk // block_k))
    kernel = functools.partial(
        _flash_nt_kernel, heads=heads, sk_actual=sk, block_k=block_k,
        sm_scale=sm_scale, out_dtype=q.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, inner), lambda b, i, j: (b + bo, i, 0)),
            pl.BlockSpec((1, block_k, inner), lambda b, i, j: (b + bo, j, 0)),
            pl.BlockSpec((1, block_k, inner), lambda b, i, j: (b + bo, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, inner),
                               lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bc, sq, inner), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((inner + 8 * heads, block_q), q.dtype),  # q panels
            pltpu.VMEM((inner, block_q), jnp.float32),          # acc
            pltpu.VMEM((heads, block_q), jnp.float32),          # m
            pltpu.VMEM((heads, block_q), jnp.float32),          # l
            pltpu.VMEM((heads, block_q), jnp.float32),          # q norms
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)


def flash_sdpa_t(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 heads: int, block_q: int = 256,
                 block_k: int = 1024) -> jnp.ndarray:
    """(B, Sq, inner) x (B, Sk, inner) -> (B, Sq, inner), numerics matching
    jax.nn.dot_product_attention (scale 1/sqrt(d))."""
    d = q.shape[2] // heads
    return flash_attention_nt(q, k, v, heads, sm_scale=1.0 / math.sqrt(d),
                              block_q=block_q, block_k=block_k)


def _flash_nt2_kernel(q_ref, k_ref, v_ref, kb_ref, vb_ref, o_ref, qt_ref,
                      acc_ref, m_ref, l_ref, qn_ref, *,
                      heads: int, sk1: int, sk2: int, block_k: int,
                      nk1: int, sm_scale: float, out_dtype):
    """Two-segment variant of _flash_nt_kernel: the key/value sequence is
    the concatenation [self (B, Sk1) ‖ bank (1, Sk2)] WITHOUT materializing
    it — the reference-attention bank (ReferenceAttentionControl concat,
    reference src/models/mutual_self_attention.py:107-126) is passed as a
    separate batch-shared operand whose blocks every batch row reads
    directly. Grid k-dim covers nk1 self blocks then nk2 bank blocks; the
    online-softmax state carries across the segment switch unchanged.

    Uses the same bound-shift softmax as _flash_nt_kernel (see there):
    the Cauchy-Schwarz bound and the MXU-folded shift row apply per
    segment block identically — the online bound carries across the
    segment switch just like the true max did."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    hd = q_ref.shape[2]
    d = hd // heads
    dp = d + 8
    bq = q_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        qt = (q_ref[0].T
              * jnp.asarray(sm_scale * 1.4426950408889634, q_ref.dtype))
        for h in range(heads):
            qh = qt[h * d:(h + 1) * d]
            qt_ref[h * dp:h * dp + d] = qh
            qt_ref[h * dp + d:(h + 1) * dp] = jnp.zeros((8, bq), qt.dtype)
            qn_ref[h:h + 1] = jnp.sqrt(jnp.sum(
                qh.astype(jnp.float32) ** 2, axis=0, keepdims=True))
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)

    in_self = j < nk1
    k_blk = jnp.where(in_self, k_ref[0], kb_ref[0])
    v_blk = jnp.where(in_self, v_ref[0], vb_ref[0])

    need_mask = (sk1 % block_k != 0) or (sk2 % block_k != 0)
    if need_mask:
        base = jnp.where(in_self, j, j - nk1) * block_k
        limit = jnp.where(in_self, sk1, sk2)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
        valid = rows + base < limit                     # (bk, 1)
        v_blk = jnp.where(valid, v_blk, 0)

    kt = k_blk.T                                        # (H·d, bk)
    vt = v_blk.T
    bk = kt.shape[1]

    def _shift(h):
        sl = slice(h * d, (h + 1) * d)
        kn2 = jnp.sum(kt[sl].astype(jnp.float32) ** 2, axis=0,
                      keepdims=True)                    # (1, bk)
        if need_mask:
            kn2 = jnp.where(valid.T, kn2, 0)
        knmax = jnp.sqrt(jnp.max(kn2, axis=1, keepdims=True))
        m_prev = m_ref[h:h + 1]
        bound = qn_ref[h:h + 1] * knmax
        row = (-jnp.maximum(m_prev, bound)).astype(qt_ref.dtype)
        qt_ref[h * dp + d:h * dp + d + 1] = row
        m_new = -row.astype(jnp.float32)
        m_ref[h:h + 1] = m_new
        return m_prev, m_new

    def _qk(h):
        ktp = jnp.concatenate(
            [kt[h * d:(h + 1) * d], jnp.ones((1, bk), kt.dtype),
             jnp.zeros((7, bk), kt.dtype)])             # (d+8, bk)
        s = jax.lax.dot_general(
            ktp, qt_ref[h * dp:(h + 1) * dp],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if need_mask:
            s = jnp.where(valid, s, NEG_INF)
        return s

    # software-pipelined heads (see _flash_nt_kernel)
    ms_next = _shift(0)
    s_next = _qk(0)
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        m_prev, m_new = ms_next
        s = s_next
        if h + 1 < heads:
            ms_next = _shift(h + 1)
            s_next = _qk(h + 1)

        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s.astype(vt.dtype))
        vt_plus = jnp.concatenate(
            [vt[sl], jnp.ones((1, vt.shape[1]), vt.dtype)])
        pv = jax.lax.dot_general(
            vt_plus, p,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[sl] = acc_ref[sl] * alpha + pv[:-1]
        l_ref[h:h + 1] = l_ref[h:h + 1] * alpha + pv[-1:]

    @pl.when(j == nk - 1)
    def _emit():
        ot = jnp.concatenate(
            [acc_ref[h * d:(h + 1) * d] / l_ref[h:h + 1]
             for h in range(heads)], axis=0)
        o_ref[0] = ot.T.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "block_k",
                                             "sm_scale", "batch_start",
                                             "batch_count"))
def flash_attention_nt_bank(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            kb: jnp.ndarray, vb: jnp.ndarray, heads: int,
                            sm_scale: float, block_q: int = 256,
                            block_k: int = 1024, batch_start: int = 0,
                            batch_count: int = 0) -> jnp.ndarray:
    """Attention over [self ‖ bank] keys without concatenation.
    q/k/v: (B, Sq|Sk1, H·d); kb/vb: (1, Sk2, H·d) shared by every batch
    row. Exact (online softmax across both segments). batch_start/count
    select a batch window in place (see flash_attention_nt)."""
    b, sq, inner = q.shape
    sk1 = k.shape[1]
    sk2 = kb.shape[1]
    nk1 = -(-sk1 // block_k)
    nk2 = -(-sk2 // block_k)
    bc = batch_count or b
    bo = batch_start

    grid = (bc, -(-sq // block_q), nk1 + nk2)
    kernel = functools.partial(
        _flash_nt2_kernel, heads=heads, sk1=sk1, sk2=sk2, block_k=block_k,
        nk1=nk1, sm_scale=sm_scale, out_dtype=q.dtype)
    in_specs = [
        pl.BlockSpec((1, block_q, inner),
                     lambda b, i, j: (b + bo, i, 0)),
        pl.BlockSpec((1, block_k, inner),
                     lambda b, i, j: (b + bo, jnp.minimum(j, nk1 - 1), 0)),
        pl.BlockSpec((1, block_k, inner),
                     lambda b, i, j: (b + bo, jnp.minimum(j, nk1 - 1), 0)),
        pl.BlockSpec((1, block_k, inner),
                     lambda b, i, j: (0, jnp.maximum(j - nk1, 0), 0)),
        pl.BlockSpec((1, block_k, inner),
                     lambda b, i, j: (0, jnp.maximum(j - nk1, 0), 0)),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, inner),
                               lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bc, sq, inner), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((inner + 8 * heads, block_q), q.dtype),  # q panels
            pltpu.VMEM((inner, block_q), jnp.float32),          # acc
            pltpu.VMEM((heads, block_q), jnp.float32),          # m
            pltpu.VMEM((heads, block_q), jnp.float32),          # l
            pltpu.VMEM((heads, block_q), jnp.float32),          # q norms
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v, kb, vb)
