"""Capture + parse an XLA profile of one denoising-UNet step on the TPU.

Uses jax.profiler trace capture and the native ProfileData reader (no
tensorboard needed). Prints the top ops by total device time — the ground
truth for optimization priorities.

Run: python tools/profile_unet.py [trace_dir]
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build_step():
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
    banks = [b[1] for b in jax.jit(
        lambda a, b: U.unet2d_apply(p2, rcfg, a, jnp.zeros(()), b)
    )(ref_lat, ctx2)]
    x = jax.random.normal(k[4], (2, F, h, w, 8), dtype)
    ctx = jax.random.normal(k[5], (2, 1, 768), dtype)
    pose = jax.random.normal(k[6], (2, F, h, w, 320), dtype)
    fn = jax.jit(lambda x, c, pf, bk: U.unet3d_apply(
        p3, cfg, x, jnp.asarray(500.0), c, pf, list(bk), cfg_split=True))
    args = (x, ctx, pose, tuple(banks))
    return fn, args


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unet_trace"
    fn, args = build_step()
    sync(fn(*args))  # compile (cached) + warm

    jax.profiler.start_trace(trace_dir)
    sync(fn(*args))
    jax.profiler.stop_trace()

    # parse the xplane
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane captured under", trace_dir)
        return
    from jax.profiler import ProfileData
    pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    totals = defaultdict(float)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name.split(".")[0]
                totals[name] += dur
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:30]
    ssum = sum(totals.values())
    print(f"total device event time: {ssum:.1f} ms (overcounts nesting)")
    for name, ms in top:
        print(f"{ms:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
