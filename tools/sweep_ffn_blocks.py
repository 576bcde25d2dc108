"""Sweep the row-block size of the fused LN+GEGLU-FF kernels at the
production denoise-step shapes (lvl0/lvl1, nsc and snc variants).

The kernels shipped with bm=512 from round 2 without a sweep; the flash
sweep (tools/sweep_flash_blocks.py) showed the 512 default was leaving
~8% on the table there, so re-check here. Usage:
    python tools/sweep_ffn_blocks.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mimo_tpu.ops import ffn as F


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
    eps = 1e-5
    # (label, rows, C) for the nsc 2-D row-major kernel: spatial tokens are
    # B*S rows (B=48 CFG pair x 24 frames), temporal-FF tokens B*S too.
    for label, r, c in [("lvl0", 48 * 6272, 320), ("lvl1", 48 * 1568, 640),
                        ("lvl2", 48 * 392, 1280)]:
        inner = 4 * c
        ks = jax.random.split(key, 7)
        x = jax.random.normal(ks[0], (r, c), jnp.bfloat16)
        scale = jax.random.normal(ks[1], (c,), jnp.bfloat16)
        bias = jax.random.normal(ks[2], (c,), jnp.bfloat16)
        wu = jax.random.normal(ks[3], (c, 2 * inner), jnp.bfloat16) * 0.02
        bu = jax.random.normal(ks[4], (2 * inner,), jnp.bfloat16)
        wd = jax.random.normal(ks[5], (inner, c), jnp.bfloat16) * 0.02
        bd = jax.random.normal(ks[6], (c,), jnp.bfloat16)
        flops = r * (c * 2 * inner + inner * c) * 2
        for bm in (256, 512, 768, 1024, 1536, 2048):
            if bm > r:
                print(f"nsc {label} bm={bm}: skipped (block > row extent "
                      f"{r})", flush=True)
                continue
            if not F._budget_ok(c, inner, bm, 2):
                print(f"nsc {label} bm={bm}: over VMEM budget", flush=True)
                continue
            try:
                dt = bench(F._ffn_pallas_nsc, x, scale, bias, wu, bu, wd,
                           bd, eps, bm=bm)
            except Exception as e:
                print(f"nsc {label} bm={bm}: FAIL {type(e).__name__}",
                      flush=True)
                continue
            print(f"nsc {label} bm={bm}: {dt:7.2f} ms  "
                  f"({flops / dt / 1e9:.0f} TFLOP/s)", flush=True)
    # snc variant: (S, N, C) conv-layout blocks, N=48
    n = 48
    for label, s, c in [("lvl0", 6272, 320), ("lvl1", 1568, 640)]:
        inner = 4 * c
        ks = jax.random.split(key, 7)
        x = jax.random.normal(ks[0], (s, n, c), jnp.bfloat16)
        scale = jax.random.normal(ks[1], (c,), jnp.bfloat16)
        bias = jax.random.normal(ks[2], (c,), jnp.bfloat16)
        wu = jax.random.normal(ks[3], (c, 2 * inner), jnp.bfloat16) * 0.02
        bu = jax.random.normal(ks[4], (2 * inner,), jnp.bfloat16)
        wd = jax.random.normal(ks[5], (inner, c), jnp.bfloat16) * 0.02
        bd = jax.random.normal(ks[6], (c,), jnp.bfloat16)
        flops = s * n * (c * 2 * inner + inner * c) * 2
        for bs in (5, 8, 10, 16, 21, 32):
            if bs > s:
                print(f"snc {label} bs={bs}: skipped (block > S extent {s})",
                      flush=True)
                continue
            if not F._budget_ok(c, inner, bs * n, 2):
                print(f"snc {label} bs={bs}: over VMEM budget", flush=True)
                continue
            try:
                dt = bench(F._ffn_pallas_snc, x, scale, bias, wu, bu, wd,
                           bd, eps, bs=bs)
            except Exception as e:
                print(f"snc {label} bs={bs}: FAIL {type(e).__name__}",
                      flush=True)
                continue
            print(f"snc {label} bs={bs}: {dt:7.2f} ms  "
                  f"({flops / dt / 1e9:.0f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
