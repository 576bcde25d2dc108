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


def main_decomp():
    """A/B the per-block vs global-shift softmax at the decomp ViT
    attention shapes (VERDICT r4 #5: settle the env flag where it was
    predicted to win). Shapes: Hiera-large global-attention blocks at the
    1024^2 SAM2 encode (stage 3: 4096 tokens x 576 ch x 8 heads; stage 4:
    1024 x 1152 x 16) and the DepthAnythingV2 ViT-L (1370 x 1024 x 16,
    ragged seq). No bank segment — the knm prepass has no overlapping
    producer to serialize against here."""
    import math
    key = jax.random.PRNGKey(0)
    for name, n, s, c, heads in [("hiera-s3", 8, 4096, 576, 8),
                                 ("hiera-s4", 8, 1024, 1152, 16),
                                 ("depth-vitl", 14, 1370, 1024, 16)]:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (n, s, c), jnp.bfloat16)
        k = jax.random.normal(ks[1], (n, s, c), jnp.bfloat16)
        v = jax.random.normal(ks[2], (n, s, c), jnp.bfloat16)
        d = c // heads
        sm = 1.0 / math.sqrt(d)
        bq, bk = A._pick_t_blocks(s, s, c, 2, heads=heads)
        print(f"{name}: bq={bq} bk={bk}", flush=True)
        for gs in (False, True):
            tag = "gs" if gs else "pb"
            bench(f"{name} {tag}", flash_attention_nt,
                  q, k, v, heads, sm_scale=sm, block_q=bq, block_k=bk,
                  global_shift=gs)


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
    if "--decomp" in sys.argv:
        main_decomp()
    else:
        main()
