"""Component micro-benchmarks at the headline shapes (24f 512x784).

Run on the real chip: python tools/microbench.py [unet|vae|attn|pose|all]
Prints per-component wall times so optimization effort lands where the
time is.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(out):
    """Force execution: block_until_ready does not block under the axon
    tunnel; a scalar device reduction + host fetch does."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / n


def bench_unet():
    from mimo_tpu import config as C
    from mimo_tpu.models import unet as U
    cfg = C.sd15_denoising_unet_config()
    rcfg = C.sd15_reference_unet_config()
    dtype = jnp.bfloat16
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    p3 = U.unet_init(k[0], cfg, dtype=dtype)
    p2 = U.unet_init(k[1], rcfg, dtype=dtype)
    F, h, w = 24, 64, 98
    ref_lat = jax.random.normal(k[2], (2, h, w, 4), dtype)
    ctx2 = jax.random.normal(k[3], (2, 1, 768), dtype)
    banks_fn = jax.jit(lambda a, b: U.unet2d_apply(p2, rcfg, a,
                                                   jnp.zeros(()), b))
    t_ref = timeit(banks_fn, ref_lat, ctx2)
    banks = [b[1] for b in banks_fn(ref_lat, ctx2)]

    x = jax.random.normal(k[4], (2, F, h, w, 8), dtype)
    ctx = jax.random.normal(k[5], (2, 1, 768), dtype)
    pose = jax.random.normal(k[6], (2, F, h, w, 320), dtype)

    fn = jax.jit(lambda x, c, pf, bk: U.unet3d_apply(
        p3, cfg, x, jnp.asarray(500.0), c, pf, list(bk), cfg_split=True))
    t = timeit(fn, x, ctx, pose, tuple(banks))
    print(json.dumps({"component": "unet3d_step_cfgpair_24f",
                      "seconds": round(t, 3),
                      "per_30steps": round(t * 30, 1)}))
    print(json.dumps({"component": "reference_unet", "seconds": round(t_ref, 3)}))


def bench_vae():
    from mimo_tpu import config as C
    from mimo_tpu.models import vae as V
    cfg = C.VAEConfig()
    dtype = jnp.bfloat16
    p = V.vae_init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    x4 = jax.random.normal(jax.random.PRNGKey(1), (4, 512, 784, 3), dtype)
    z4 = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 98, 4), dtype)
    enc = jax.jit(lambda a: V.encode_mean(p, cfg, a))
    dec = jax.jit(lambda a: V.decode(p, cfg, a))
    te = timeit(enc, x4)
    td = timeit(dec, z4)
    print(json.dumps({"component": "vae_encode_4f", "seconds": round(te, 3),
                      "per_25f": round(te * 25 / 4, 2)}))
    print(json.dumps({"component": "vae_decode_4f", "seconds": round(td, 3),
                      "per_24f": round(td * 6, 2)}))


def bench_attn():
    from mimo_tpu.ops.attention import dispatch_sdpa
    dtype = jnp.bfloat16
    shapes = [
        ("lvl0_cond", 24, 6272, 12544, 8, 320),
        ("lvl0_unc", 24, 6272, 6272, 8, 320),
        ("lvl1_cond", 24, 1568, 3136, 8, 640),
        ("lvl2_cond", 24, 392, 784, 8, 1280),
        ("temporal_lvl0", 2 * 6272, 24, 24, 8, 320),
    ]
    for name, b, sq, sk, heads, inner in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, sq, inner), dtype)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, sk, inner), dtype)
        fn = jax.jit(lambda q, k: dispatch_sdpa(q, k, k, heads))
        t = timeit(fn, q, k)
        flops = 4 * b * sq * sk * inner
        print(json.dumps({"component": f"attn_{name}",
                          "seconds": round(t, 4),
                          "tflops_s": round(flops / t / 1e12, 1)}))


def bench_pose():
    from mimo_tpu import config as C
    from mimo_tpu.models import pose_guider as PG
    from mimo_tpu.models import clip_vision as CV
    dtype = jnp.bfloat16
    pcfg = C.PoseGuiderConfig()
    p = PG.pose_guider_init(jax.random.PRNGKey(0), pcfg, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 512, 784, 3), dtype)
    fn = jax.jit(lambda a: PG.pose_guider_apply(p, a))
    t = timeit(fn, x)
    print(json.dumps({"component": "pose_guider_24f", "seconds": round(t, 3)}))

    ccfg = C.CLIPVisionConfig()
    cp = CV.clip_vision_init(jax.random.PRNGKey(2), ccfg, dtype=dtype)
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 224, 224, 3), dtype)
    fnc = jax.jit(lambda a: CV.clip_image_embed(cp, ccfg, a))
    t = timeit(fnc, img)
    print(json.dumps({"component": "clip_embed", "seconds": round(t, 3)}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("attn", "all"):
        bench_attn()
    if which in ("vae", "all"):
        bench_vae()
    if which in ("pose", "all"):
        bench_pose()
    if which in ("unet", "all"):
        bench_unet()
