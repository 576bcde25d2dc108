"""Ablation cost model for the transposed flash kernel (lvl0 cond shape).

The production cond call measures ~33 ms vs an estimated ~15 ms MXU +
~19 ms VPU — near-perfect additivity, i.e. no MXU/VPU overlap. Before
attempting any scheduling change, this tool times kernel variants with
individual pieces removed to attribute the 33 ms:

  full        production math (sanity: should match tune_flash cond)
  noexp       p = s.astype(bf16)            -> full - noexp = exp2 cost
  nopv        acc += p[:d+1] (no PV matmul) -> full - nopv  = PV cost
  noqk        s = broadcast of one k row    -> full - noqk  = QK cost
  noshift     skip the C-S bound update     -> shift-chain cost
  notrans     kt/vt read pre-transposed     -> in-VMEM transpose cost

Every variant keeps a data dependency on the inputs so Mosaic cannot
DCE the remaining work. Numbers are NOT exact decompositions (removing
an op frees VMEM bandwidth and issue slots for its neighbours) but rank
the targets. Usage: python tools/ablate_flash.py
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, qt_ref, acc_ref, m_ref, l_ref,
            qn_ref, *, heads, sk_actual, block_k, sm_scale, out_dtype,
            mode, pretransposed):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    hd = qt_ref.shape[0] // 1
    d = (q_ref.shape[2] if not pretransposed else q_ref.shape[1]) // heads
    dp = d + 8
    bq = qt_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        qt = ((q_ref[0] if pretransposed else q_ref[0].T)
              * jnp.asarray(sm_scale * 1.4426950408889634, q_ref.dtype))
        for h in range(heads):
            qh = qt[h * d:(h + 1) * d]
            qt_ref[h * dp:h * dp + d] = qh
            qt_ref[h * dp + d:(h + 1) * dp] = jnp.zeros((8, bq), qt.dtype)
            qn_ref[h:h + 1] = jnp.sqrt(jnp.sum(
                qh.astype(jnp.float32) ** 2, axis=0, keepdims=True))
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)

    if pretransposed:
        kt = k_ref[0]
        vt = v_ref[0]
    else:
        kt = k_ref[0].T
        vt = v_ref[0].T
    bk = kt.shape[1]

    def _shift(h):
        if mode == "noshift":
            # constant shift of 8 (logits at these scales stay well under
            # it); still writes the row once so the QK panel is valid
            row = jnp.full((1, bq), -8.0, qt_ref.dtype)
            qt_ref[h * dp + d:h * dp + d + 1] = row
            return (jnp.full((1, bq), 8.0, jnp.float32),) * 2
        sl = slice(h * d, (h + 1) * d)
        kn2 = jnp.sum(kt[sl].astype(jnp.float32) ** 2, axis=0, keepdims=True)
        knmax = jnp.sqrt(jnp.max(kn2, axis=1, keepdims=True))
        m_prev = m_ref[h:h + 1]
        bound = qn_ref[h:h + 1] * knmax
        row = (-jnp.maximum(m_prev, bound)).astype(qt_ref.dtype)
        qt_ref[h * dp + d:h * dp + d + 1] = row
        m_new = -row.astype(jnp.float32)
        m_ref[h:h + 1] = m_new
        return m_prev, m_new

    def _qk(h):
        if mode in ("noqk", "nomxu"):
            # data-dependent stand-in without the matmul: one k row
            # broadcast against one q row (rank-1, VPU)
            return (kt[h * d:h * d + 1].T
                    * qt_ref[h * dp:h * dp + 1]) - 8.0
        ktp = jnp.concatenate(
            [kt[h * d:(h + 1) * d], jnp.ones((1, bk), kt.dtype),
             jnp.zeros((7, bk), kt.dtype)])
        return jax.lax.dot_general(
            ktp, qt_ref[h * dp:(h + 1) * dp],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if mode in ("chunk2", "chunk4"):
        # strip-mined interleave: split each head's QK->exp2->PV chain into
        # bk chunks so the scheduler sees alternating small MXU/VPU ops
        # (chunk c+1's QK can issue while chunk c's exp2/PV run)
        nch = 2 if mode == "chunk2" else 4
        ck = bk // nch
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            m_prev, m_new = _shift(h)
            alpha = jnp.exp2(m_prev - m_new)
            acc_ref[sl] = acc_ref[sl] * alpha
            l_ref[h:h + 1] = l_ref[h:h + 1] * alpha
            ktp = jnp.concatenate(
                [kt[sl], jnp.ones((1, bk), kt.dtype),
                 jnp.zeros((7, bk), kt.dtype)])
            # concat the ones row over the full bk, then lane-slice chunks
            # (concatenating a lane-sliced operand trips a Mosaic
            # "offset mismatch on non-concat dimension" bug)
            vt_plus_full = jnp.concatenate(
                [vt[sl], jnp.ones((1, bk), vt.dtype)])
            for ci in range(nch):
                cs = slice(ci * ck, (ci + 1) * ck)
                s = jax.lax.dot_general(
                    ktp[:, cs], qt_ref[h * dp:(h + 1) * dp],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p = jnp.exp2(s.astype(vt.dtype))
                pv = jax.lax.dot_general(
                    vt_plus_full[:, cs], p,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[sl] = acc_ref[sl] + pv[:-1]
                l_ref[h:h + 1] = l_ref[h:h + 1] + pv[-1:]

        @pl.when(j == nk - 1)
        def _emit_chunk():
            ot = jnp.concatenate(
                [acc_ref[h * d:(h + 1) * d] / l_ref[h:h + 1]
                 for h in range(heads)], axis=0)
            o_ref[0] = ot.T.astype(out_dtype)
        return

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
        if mode == "noexp":
            p = s.astype(vt.dtype)
        elif mode == "nosm":
            # drops BOTH the f32 read/convert and the exp2, keeping the
            # (bk, bq) bf16 materialization and a dependency on s row 0:
            # full - nosm = convert + exp2 cost
            p = jnp.broadcast_to(s[:1].astype(vt.dtype), s.shape)
        else:
            p = jnp.exp2(s.astype(vt.dtype))
        if mode in ("nopv", "nomxu"):
            # keep a dependency on every p element without the matmul:
            # one VPU row-reduce (tiny vs the (bk,bq) exp2 it follows)
            acc_ref[sl] = acc_ref[sl] * alpha + jnp.sum(p, axis=0,
                                                        keepdims=True)
            l_ref[h:h + 1] = l_ref[h:h + 1] * alpha + p[:1]
        else:
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
                                             "sm_scale", "mode",
                                             "pretransposed"))
def run(q, k, v, heads, sm_scale, block_q, block_k, mode="full",
        pretransposed=False):
    if pretransposed:
        b, inner, sq = q.shape
        sk = k.shape[2]
        qspec = pl.BlockSpec((1, inner, block_q), lambda b, i, j: (b, 0, i))
        kspec = pl.BlockSpec((1, inner, block_k), lambda b, i, j: (b, 0, j))
    else:
        b, sq, inner = q.shape
        sk = k.shape[1]
        qspec = pl.BlockSpec((1, block_q, inner), lambda b, i, j: (b, i, 0))
        kspec = pl.BlockSpec((1, block_k, inner), lambda b, i, j: (b, j, 0))
    grid = (b, -(-sq // block_q), -(-sk // block_k))
    kernel = functools.partial(
        _kernel, heads=heads, sk_actual=sk, block_k=block_k,
        sm_scale=sm_scale, out_dtype=q.dtype, mode=mode,
        pretransposed=pretransposed)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kspec, kspec],
        out_specs=pl.BlockSpec((1, block_q, inner),
                               lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, inner), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((inner + 8 * heads, block_q), q.dtype),
            pltpu.VMEM((inner, block_q), jnp.float32),
            pltpu.VMEM((heads, block_q), jnp.float32),
            pltpu.VMEM((heads, block_q), jnp.float32),
            pltpu.VMEM((heads, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(label, fn, *args, reps=10, **kw):
    o = fn(*args, **kw)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args, **kw)
    sync(o)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{label}: {dt:7.2f} ms/call", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    # lvl0 cond-equivalent: B=24, Sq=6272, Sk=12544 (self+bank concat),
    # C=320, H=8 — same logits/FLOPs as the production bank call
    b, sq, sk, c, heads = 24, 6272, 12544, 320, 8
    bq, bk = 896, 3136
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, sq, c), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, sk, c), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, sk, c), jnp.bfloat16)
    sm = 1.0 / math.sqrt(c // heads)

    times = {}
    for mode in ("full", "nomxu", "chunk2", "chunk4"):
        times[mode] = bench(f"lvl0cond {mode:8s}", run, q, k, v, heads,
                            sm_scale=sm, block_q=bq, block_k=bk, mode=mode)
    # pretransposed A/B: bk must be a 128-multiple there (it lands on the
    # lane axis of the k/v blocks) — compare both layouts at bk=1792
    bk2 = 1792
    times["full@1792"] = bench("lvl0cond full@1792", run, q, k, v, heads,
                               sm_scale=sm, block_q=bq, block_k=bk2,
                               mode="full")
    qt = jnp.transpose(q, (0, 2, 1)).copy()
    kt = jnp.transpose(k, (0, 2, 1)).copy()
    vt = jnp.transpose(v, (0, 2, 1)).copy()
    times["notrans@1792"] = bench("lvl0cond notrans@1792", run, qt, kt, vt,
                                  heads, sm_scale=sm, block_q=bq,
                                  block_k=bk2, mode="full",
                                  pretransposed=True)
    f = times["full"]
    print("\nattribution (full - ablated):")
    for mode in ("nomxu", "chunk2", "chunk4"):
        print(f"  {mode:9s}: {f - times[mode]:+7.2f} ms")
    print(f"  transposes (full@1792 - notrans@1792): "
          f"{times['full@1792'] - times['notrans@1792']:+7.2f} ms")


if __name__ == "__main__":
    main()
