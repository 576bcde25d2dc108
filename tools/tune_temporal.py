"""Tune the temporal-attention kernel block size on the real TPU.

The profile (round 3) puts temporal_attention_fused at ~113 ms/step
(10 calls x ~11.3 ms) vs a ~2.5 ms MXU floor per call — the VPU rolls
dominate. Hypothesis: bs that is a multiple of 128 makes every in-kernel
lane roll a whole-vreg move (r*bs % 128 == 0) instead of a cross-lane
shuffle. Usage: python tools/tune_temporal.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mimo_tpu.ops import temporal_attention as TA


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    key = jax.random.PRNGKey(0)
    # (name, B, F, S, C, heads) — lvl0 and lvl1 step shapes
    shapes = [
        ("lvl0", 2, 24, 6272, 320, 8),
        ("lvl1", 2, 24, 1568, 640, 8),
    ]
    for name, b, f, s, c, heads in shapes:
        x = jax.random.normal(key, (b, f, s, c), jnp.bfloat16)
        scale = jnp.ones((c,), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)
        pe = jax.random.normal(key, (f, c), jnp.bfloat16)
        w = [jax.random.normal(key, (c, c), jnp.bfloat16) * 0.02
             for _ in range(4)]
        bo = jnp.zeros((c,), jnp.bfloat16)
        auto = TA._pick_bs(s, c, f, 2)
        for bs in sorted({auto, 16, 32, 64, 128, 256}):
            if bs == 0 or bs > s:
                continue
            try:
                fn = lambda xx: TA.temporal_attention_fused(
                    xx, scale, bias, pe, *w, bo, frames=f, heads=heads,
                    ln=True, residual=True, bs_override=bs)
                o = fn(x)
                sync(o)
                t0 = time.perf_counter()
                reps = 10
                for _ in range(reps):
                    o = fn(x)
                sync(o)
                dt = (time.perf_counter() - t0) / reps * 1000
                tag = " (auto)" if bs == auto else ""
                print(f"{name} bs={bs:4d}: {dt:7.2f} ms/call{tag}",
                      flush=True)
            except Exception as e:
                print(f"{name} bs={bs:4d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
