"""Time the transposed flash kernels at the production step shapes on the
real TPU (lvl0/lvl1, CFG batch windows like the step program issues them).
Usage: python tools/tune_flash.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mimo_tpu.ops import attention as A
from mimo_tpu.ops.flash_transposed import (flash_attention_nt,
                                           flash_attention_nt_bank)


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
    return o


def main():
    import math
    key = jax.random.PRNGKey(0)
    for name, n, s, c, heads in [("lvl0", 48, 6272, 320, 8),
                                 ("lvl1", 48, 1568, 640, 8)]:
        ks = jax.random.split(key, 5)
        q = jax.random.normal(ks[0], (n, s, c), jnp.bfloat16)
        k = jax.random.normal(ks[1], (n, s, c), jnp.bfloat16)
        v = jax.random.normal(ks[2], (n, s, c), jnp.bfloat16)
        kb = jax.random.normal(ks[3], (1, s, c), jnp.bfloat16)
        vb = jax.random.normal(ks[4], (1, s, c), jnp.bfloat16)
        d = c // heads
        sm = 1.0 / math.sqrt(d)
        h = n // 2
        bq, bk = A._pick_t_blocks(s, s, c, 2)
        print(f"{name}: bq={bq} bk={bk}", flush=True)
        for gs in (False, True):
            tag = "gs" if gs else "pb"
            bench(f"{name} unc  {tag} (nt,   batch {h})", flash_attention_nt,
                  q, k, v, heads, sm_scale=sm, block_q=bq, block_k=bk,
                  batch_start=0, batch_count=h, global_shift=gs)
            o = bench(f"{name} cond {tag} (bank, batch {h})",
                      flash_attention_nt_bank,
                      q, k, v, kb, vb, heads, sm_scale=sm, block_q=bq,
                      block_k=bk, batch_start=h, batch_count=h,
                      global_shift=gs)
        # numerics spot check vs the XLA oracle on a small batch slice
        import numpy as np
        qs, ks_, vs = q[h:h + 2], k[h:h + 2], v[h:h + 2]
        kcat = jnp.concatenate([ks_, jnp.broadcast_to(kb, (2,) + kb.shape[1:])], 1)
        vcat = jnp.concatenate([vs, jnp.broadcast_to(vb, (2,) + vb.shape[1:])], 1)
        want = jax.nn.dot_product_attention(
            qs.reshape(2, s, heads, d), kcat.reshape(2, 2 * s, heads, d),
            vcat.reshape(2, 2 * s, heads, d)).reshape(2, s, c)
        diff = float(jnp.max(jnp.abs(o[:2].astype(jnp.float32)
                                     - want.astype(jnp.float32))))
        print(f"{name} cond max|Δ| vs XLA oracle: {diff:.5f}", flush=True)


if __name__ == "__main__":
    main()
