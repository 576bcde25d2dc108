"""One-off block sweep for the bound-shift flash kernels at the lvl0
production shape (the 38 ms cond / 21 ms unc calls — 2/3 of step flash
time). The shipped policy (bq=512, bk=3136) was tuned for the true-max
kernel; the bound-shift kernel moved VPU/MXU balance, so re-sweep.

Usage: python tools/sweep_flash_blocks.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mimo_tpu.ops.flash_transposed import (flash_attention_nt,
                                           flash_attention_nt_bank)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, reps=10, **kw):
    o = fn(*args, **kw)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args, **kw)
    sync(o)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    key = jax.random.PRNGKey(0)
    n, s, c, heads = 48, 6272, 320, 8
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (n, s, c), jnp.bfloat16)
    k = jax.random.normal(ks[1], (n, s, c), jnp.bfloat16)
    v = jax.random.normal(ks[2], (n, s, c), jnp.bfloat16)
    kb = jax.random.normal(ks[3], (1, s, c), jnp.bfloat16)
    vb = jax.random.normal(ks[4], (1, s, c), jnp.bfloat16)
    d = c // heads
    sm = 1.0 / math.sqrt(d)
    h = n // 2

    # s=6272 = 2^5·7^2·... divisors that are 128-mult: 448, 896, 1568, 3136, 6272
    combos = [(512, 3136), (512, 1568), (512, 6272), (256, 3136),
              (768, 3136), (448, 3136), (512, 896), (640, 3136)]
    for bq, bk in combos:
        if s % bk and bk != s:
            continue
        try:
            t_u = bench(flash_attention_nt, q, k, v, heads, sm_scale=sm,
                        block_q=bq, block_k=bk, batch_start=0, batch_count=h)
            t_c = bench(flash_attention_nt_bank, q, k, v, kb, vb, heads,
                        sm_scale=sm, block_q=bq, block_k=bk,
                        batch_start=h, batch_count=h)
            print(f"bq={bq:4d} bk={bk:5d}: unc {t_u:6.2f}  cond {t_c:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:4d} bk={bk:5d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
