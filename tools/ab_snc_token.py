"""A/B the (S, N, C) conv-layout token path in the spatial transformer on
the real TPU: numerics (vs the natural path) and in-context timing.

The timing harness brackets the transformer with the 3x3 convs it sits
between in the UNet resnet blocks, so the layout interaction (relayout
copies around Pallas custom calls) is part of what's measured — an
isolated call would hide exactly the cost this path exists to remove.

Run: python tools/ab_snc_token.py [lvl0|lvl1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mimo_tpu.config import UNetConfig
from mimo_tpu.models import layers as L
from mimo_tpu.models import unet as U


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    lvl = sys.argv[1] if len(sys.argv) > 1 else "lvl0"
    # flagship step shapes: N = 2 (CFG) * 24 frames; lvl0 64x98 @ c320,
    # lvl1 32x49 @ c640; bank = same token count (reference frame)
    if lvl == "lvl0":
        n, hgt, wid, c, heads = 48, 64, 98, 320, 8
    else:
        n, hgt, wid, c, heads = 48, 32, 49, 640, 8
    cfg = UNetConfig(num_heads=heads)
    key = jax.random.PRNGKey(0)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                     U.spatial_transformer_init(key, c, 768))
    conv_p = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          L.conv2d_init(key, 3, 3, c, c))
    x = jax.random.normal(key, (n, hgt, wid, c), jnp.bfloat16)
    ctx = jax.random.normal(key, (n, 1, 768), jnp.bfloat16)
    bank = jax.random.normal(key, (hgt * wid, c), jnp.bfloat16)

    def fwd(x, ctx, bank):
        h = L.conv2d(conv_p, x, padding=1)
        h = U.spatial_transformer_apply(p, h, ctx, cfg, bank_in=bank,
                                        cfg_split=True)
        return L.conv2d(conv_p, h, padding=1)

    outs = {}
    for mode in (True, False):
        U.SNC_TOKEN_PATH = mode
        f = jax.jit(fwd)
        o = f(x, ctx, bank)
        sync(o)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            o = f(x, ctx, bank)
        sync(o)
        dt = (time.perf_counter() - t0) / reps * 1000
        outs[mode] = (o.astype(jnp.float32), dt)
        print(f"snc={mode}: {dt:.2f} ms/call")

    diff = jnp.max(jnp.abs(outs[True][0] - outs[False][0]))
    rel = diff / (jnp.max(jnp.abs(outs[False][0])) + 1e-9)
    print(f"max|Δ| = {float(diff):.5f}  (rel {float(rel):.5f})")
    print(f"speedup: {outs[False][1] / outs[True][1]:.3f}x")


if __name__ == "__main__":
    main()
