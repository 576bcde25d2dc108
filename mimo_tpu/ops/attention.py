"""TPU attention dispatch: Pallas flash attention for long sequences, XLA
fused attention otherwise.

Why: XLA materializes the full score matrix for plain dot-product attention
— at the UNet's top resolution (6272 query tokens × 12544 bank-concat keys
× 24 frames × 8 heads) that is a 30 GB fp32 allocation, far beyond HBM.
The Pallas flash kernel (jax.experimental.pallas.ops.tpu.flash_attention)
streams K/V blocks through VMEM with an online softmax, so memory is
O(block²) instead of O(S²).

Ragged sequence lengths (1568, 6272, 12544 … not all multiples of the MXU
block) are handled by zero-padding to a 128 multiple and masking the pads
via SegmentIds — exact, not approximate (validated against the XLA path in
tests/test_ops.py and inline during bring-up: max |Δ| ≈ 1e-3 in bf16).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

FLASH_MIN_Q = 1024          # below this, XLA's fused path is fine
_LANE = 128
# global-shift softmax in the transposed flash kernels: the Cauchy-Schwarz
# shift is precomputed over the whole key sequence outside the kernel,
# deleting every per-block softmax-state VPU pass (flash_transposed.py).
# Measured (tools/tune_flash.py + bench.py, v5e round 4): ISOLATED it wins
# at lvl1 (sq=1568, 1-2 k blocks: cond 8.05->6.55 ms, unc 5.12->4.99) and
# slightly loses at lvl0 (cond 34.2->35.3); IN-PROGRAM the lvl1 swap
# regressed the denoise step 0.890->0.898 s (bench 0.8694->0.8635 fps) —
# the knm XLA prepass is a serialization point that breaks the overlap
# the isolated timing can't see (microbench caveat, BENCH_NOTES.md).
# Default OFF; env override for experiments: MIMO_FLASH_GLOBAL_SHIFT=1.
import os as _os
_GS_ENV = _os.environ.get("MIMO_FLASH_GLOBAL_SHIFT")


def _use_global_shift(sq: int) -> bool:
    if _GS_ENV is not None:
        return _GS_ENV != "0"
    return False


def _pad_to(x: jnp.ndarray, axis: int, target: int) -> jnp.ndarray:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_block(seq: int, cap: int = 1024) -> int:
    """Largest multiple-of-128 divisor of `seq` that is <= cap.

    Measured on v5e (24x8 heads, d=40, sq 6272, sk 12544): small QUERY
    blocks with large KEY blocks are ~10x faster than square blocks
    (bq=224,bk=896: 22.4 TFLOP/s vs bq=bk=896: 2.3 TFLOP/s) — large q
    blocks blow up the per-block VMEM score tile and stall the pipeline.
    Hence the separate caps below.
    """
    best = _LANE
    b = _LANE
    while b <= cap:
        if seq % b == 0:
            best = b
        b += _LANE
    return best


def _pick_block_q(seq: int) -> int:
    """Largest divisor of seq that is a multiple of 8 (sublane granularity —
    query blocks, unlike key blocks, need not be 128-multiples) and <= 256."""
    best = 8
    b = 8
    while b <= 256:
        if seq % b == 0:
            best = b
        b += 8
    return best


def _pick_block_k(seq: int) -> int:
    # measured: bk=1792 beats 896 on the 12544-key shape (31.8 vs 27.3 TF/s)
    return _pick_block(seq, cap=2048)


@functools.lru_cache(maxsize=None)
def _flash_available() -> bool:
    if jax.default_backend() != "tpu":
        return False
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa
        return True
    except Exception:
        return False


def flash_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               heads: int) -> jnp.ndarray:
    """(B, Sq, inner) x (B, Sk, inner) -> (B, Sq, inner) via Pallas flash."""
    from jax.experimental.pallas.ops.tpu import flash_attention as FA

    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads

    def to_bhsd(x):
        s = x.shape[1]
        return x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = to_bhsd(q), to_bhsd(k), to_bhsd(v)
    sq_p = -(-sq // _LANE) * _LANE
    sk_p = -(-sk // _LANE) * _LANE
    qh = _pad_to(qh, 2, sq_p)
    kh = _pad_to(kh, 2, sk_p)
    vh = _pad_to(vh, 2, sk_p)

    seg = None
    if sq_p != sq or sk_p != sk:
        qseg = (jnp.arange(sq_p) >= sq).astype(jnp.int32)
        kseg = (jnp.arange(sk_p) >= sk).astype(jnp.int32)
        seg = FA.SegmentIds(q=jnp.broadcast_to(qseg[None], (b, sq_p)),
                            kv=jnp.broadcast_to(kseg[None], (b, sk_p)))

    bq = _pick_block_q(sq_p)
    bk = _pick_block_k(sk_p)
    bs = FA.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = FA.flash_attention(qh, kh, vh, segment_ids=seg, block_sizes=bs,
                             sm_scale=1.0 / math.sqrt(d))
    out = out[:, :, :sq].transpose(0, 2, 1, 3).reshape(b, sq, inner)
    return out


def _pick_t_blocks(sq: int, sk: int, inner: int, itemsize: int,
                   sk_min: Optional[int] = None,
                   heads: Optional[int] = None) -> Tuple[int, int]:
    """Blocks for the natural-layout transposed-compute kernel. Blocks are
    full-width (block, H·d), so the VMEM working set is dominated by the
    double-buffered K/V blocks, their in-kernel transposes, and the fp32
    logits tile. bq/bk land on the lane axis of the transposed compute ->
    128-multiples. Prefer a bk that divides Sk (skips the in-kernel edge
    masking)."""
    # bq 896 on the 6272-row lvl0 shape: exact divisor (7 q blocks, no
    # ragged edge) — round-4 sweep beat the round-3 bq=640 (unc
    # 20.07->19.42, cond 34.38->34.09 ms same-session; 784 regressed;
    # in-program bench confirmed +0.5%). Other shapes keep the benched
    # 512 (lvl1 was not re-swept; 512 is its measured point); the gate is
    # == 6272, not >=, so an unswept larger query shape falls back to the
    # conservative 512 rather than silently inheriting an untested block
    # (ADVICE r3).
    bq = min(896 if sq == 6272 else 512, _ceil_to(sq, _LANE))
    # worst-case head count for the scratch model when the caller does not
    # pass it (d >= 8 on this path, so heads <= inner // 8)
    n_h = heads if heads is not None else inner // 8

    def fits(bq, bk):
        blocks = 2 * (bq + 2 * bk) * inner * itemsize   # double-buffered in
        blocks += 2 * bq * inner * itemsize             # out
        trans = 2 * bk * inner * itemsize               # kt, vt temporaries
        # qt is (inner + 8*heads, bq) in the bound-shift kernel (the bound
        # rows ride with q) + (bq, inner) f32 acc + (heads, bq) f32 qn
        scratch = (bq * inner * (itemsize + 4)
                   + 8 * n_h * bq * itemsize + n_h * bq * 4)
        logits = bk * bq * (4 + itemsize)               # s (f32) + p
        if sk % bk:
            # ragged key edge: the in-kernel iota/where masking costs extra
            # (bk, bq)-sized i32/f32 temporaries
            logits += bk * bq * 8
        # the kernel raises the Mosaic scoped-VMEM limit to 100 MB; the
        # working-set ceiling is the measured compile envelope (lvl1's
        # best point (512, 3136) models at ~38 MB and compiles fine)
        return blocks + trans + scratch + logits <= 40 * 1024 * 1024

    while bq > _LANE and not fits(bq, _LANE):
        bq -= _LANE
    # bk is the sublane dim of the (bk, bq) logits and the lane dim of the
    # in-kernel K/V transposes: the block constraint is only ÷8. Candidates
    # are 128-multiples plus 8-multiple divisors of Sk (e.g. 1568 for the
    # 6272/12544-key shapes).
    # bk cap 3136: measured optimum on every step shape (bigger blocks
    # regress — bk 4480 runs 38 TFLOP/s vs 3136's 55 on the hot shape)
    # never return a key block larger than the shortest segment it will be
    # applied to (sk_min: the banked dispatch sizes from max(sk1, sk2) but
    # applies the block to BOTH segments) — an oversized block would make
    # the edge-block DMA read past the allocation
    sk_min = sk if sk_min is None else min(sk, sk_min)
    cap = min(_ceil_to(sk, _LANE), 3136, max(8, sk_min // 8 * 8))
    cands = set(range(_LANE, cap + 1, _LANE))
    cands.update(b for b in range(128, cap + 1, 8) if sk % b == 0)
    if not cands:
        cands = {cap}                  # sk_min < 128: one floor-8 block
    best_any = min(cands)
    best_div = 0
    for b in sorted(cands):
        if not fits(bq, b):
            continue
        best_any = max(best_any, b)
        if sk % b == 0:
            best_div = b
    # a dividing block skips the in-kernel edge masking; prefer it unless
    # it is much smaller than the largest fitting block
    return bq, best_div if best_div * 2 > best_any else best_any


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def dispatch_sdpa_banked(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         kb: jnp.ndarray, vb: jnp.ndarray, heads: int,
                         batch: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """Attention over [self (B, Sk1) ‖ bank (1, Sk2)] keys. On the flash
    path the bank stays a batch-shared operand (no broadcast_to/concat
    materialization — those profiled at ~16 ms/denoise-step of
    pad_maximum fusions); elsewhere it falls back to the explicit concat.

    batch=(start, count): operate on a batch window of q/k/v in place —
    the flash path reads it via index-map offsets (an outside slice
    feeding a pallas call materializes a copy), the fallback slices.
    """
    d = q.shape[2] // heads
    if (q.shape[1] >= FLASH_MIN_Q and _flash_available()
            and d % 8 == 0 and d <= 160):
        from mimo_tpu.ops.flash_transposed import flash_attention_nt_bank
        bq, bk = _pick_t_blocks(q.shape[1], max(k.shape[1], kb.shape[1]),
                                q.shape[2], q.dtype.itemsize,
                                sk_min=min(k.shape[1], kb.shape[1]),
                                heads=heads)
        return flash_attention_nt_bank(q, k, v, kb, vb, heads,
                                       sm_scale=1.0 / math.sqrt(d),
                                       block_q=bq, block_k=bk,
                                       batch_start=batch[0],
                                       batch_count=batch[1],
                                       global_shift=_use_global_shift(
                                           q.shape[1]))
    if batch != (0, 0):
        b0, bc = batch
        q, k, v = q[b0:b0 + bc], k[b0:b0 + bc], v[b0:b0 + bc]
    m = q.shape[0]
    kbx = jnp.broadcast_to(kb, (m,) + kb.shape[1:])
    vbx = jnp.broadcast_to(vb, (m,) + vb.shape[1:])
    return dispatch_sdpa(q, jnp.concatenate([k, kbx], axis=1),
                         jnp.concatenate([v, vbx], axis=1), heads)


def dispatch_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  heads: int,
                  batch: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """Entry used by models.layers.sdpa. batch=(start, count) selects a
    batch window in place on the transposed-flash path (see
    dispatch_sdpa_banked); other paths slice."""
    if q.shape[1] >= FLASH_MIN_Q and _flash_available():
        d = q.shape[2] // heads
        # the transposed layout only wins when d would pad heavily on the
        # lane axis (UNet heads: 40/80/160); large-d attention (VAE's
        # single-head d=512 mid block) keeps the standard kernel
        if d % 8 == 0 and d <= 160:
            from mimo_tpu.ops.flash_transposed import flash_attention_nt
            bq, bk = _pick_t_blocks(q.shape[1], k.shape[1], q.shape[2],
                                    q.dtype.itemsize, heads=heads)
            return flash_attention_nt(q, k, v, heads,
                                      sm_scale=1.0 / math.sqrt(d),
                                      block_q=bq, block_k=bk,
                                      batch_start=batch[0],
                                      batch_count=batch[1],
                                      global_shift=_use_global_shift(
                                          q.shape[1]))
        if batch != (0, 0):
            q, k, v = (x[batch[0]:batch[0] + batch[1]] for x in (q, k, v))
        return flash_sdpa(q, k, v, heads)
    if batch != (0, 0):
        q, k, v = (x[batch[0]:batch[0] + batch[1]] for x in (q, k, v))
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads
    qh = q.reshape(b, sq, heads, d)
    kh = k.reshape(b, sk, heads, d)
    vh = v.reshape(b, sk, heads, d)
    o = jax.nn.dot_product_attention(qh, kh, vh)
    return o.reshape(b, sq, inner)
