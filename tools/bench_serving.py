"""Multi-clip steady-state serving bench (VERDICT r4 #4/#8).

The single-clip bench (bench.py) charges prepare (~0.6 s) and decode
(~0.72 s) serially to every clip. In a serving loop those phases are
device compute on the SAME chip as the step loop, so they cannot
overlap with it on one v5e — but the host-side gaps (dispatch latency,
input staging, output checksum) CAN hide behind enqueued device work.
This tool measures the honest steady-state rate: N clips back-to-back
with a warm jit cache and pipelined dispatch (stage clip k+1's inputs
and enqueue its prepare while clip k's step queue drains), reporting
per-clip wall and aggregate frames/sec.

Usage: python tools/bench_serving.py [--clips 3] [--steps 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def sync(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "astype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=3)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=784)
    ap.add_argument("--vae-chunk", type=int, default=8)
    args = ap.parse_args()

    from mimo_tpu import config as C
    from mimo_tpu.models import unet as U
    from mimo_tpu.models import vae as V
    from mimo_tpu.models import clip_vision as CV
    from mimo_tpu.models import pose_guider as PG
    from mimo_tpu.pipelines import pose2vid

    F, H, W = args.frames, args.height, args.width
    dtype = jnp.bfloat16
    cfg = C.MIMOConfig()
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    params = {
        "reference_unet": U.unet_init(ks[0], cfg.reference_unet, dtype=dtype),
        "denoising_unet": U.unet_init(ks[1], cfg.denoising_unet,
                                      dtype=dtype),
        "pose_guider": PG.pose_guider_init(ks[2], cfg.pose_guider,
                                           dtype=dtype),
        "vae": V.vae_init(ks[3], cfg.vae, dtype=dtype),
        "clip": CV.clip_vision_init(ks[4], cfg.clip_vision, dtype=dtype),
    }
    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W,
        num_inference_steps=args.steps, guidance_scale=3.5,
        vae_chunk=args.vae_chunk)
    cache = pose2vid.make_jit_cache(st)
    ds = cfg.vae.downscale

    def clip_inputs(seed):
        ki = jax.random.split(jax.random.PRNGKey(seed), 5)
        ref = (jax.random.uniform(ki[0], (H, W, 3)) * 2 - 1).astype(dtype)
        pose = jax.random.uniform(ki[1], (F, H, W, 3)).astype(dtype)
        bk = (jax.random.uniform(ki[2], (F, H, W, 3)) * 2 - 1).astype(dtype)
        clip_px = jax.random.normal(ki[3], (224, 224, 3)).astype(dtype)
        noise = jax.random.normal(ki[4], (F, H // ds, W // ds, 4)
                                  ).astype(dtype)
        return ref, pose, bk, clip_px, noise

    # warm every program once (compile or cache-load)
    t0 = time.time()
    warm = clip_inputs(100)
    out = pose2vid.generate_host_loop(params, st, *warm, jit_cache=cache)
    sync(out)
    print(f"# warm-up clip (compile/cache): {time.time() - t0:.1f}s",
          flush=True)

    # steady-state: N clips back-to-back; inputs for clip k+1 staged while
    # clip k's device queue drains (generate_host_loop enqueues async)
    per_clip = []
    inputs = clip_inputs(0)
    t_all = time.time()
    for k in range(args.clips):
        t = time.time()
        out = pose2vid.generate_host_loop(params, st, *inputs,
                                          jit_cache=cache)
        if k + 1 < args.clips:
            inputs = clip_inputs(k + 1)   # staged against the device queue
        sync(out)
        per_clip.append(time.time() - t)
        print(f"# clip {k}: {per_clip[-1]:.3f}s = "
              f"{F / per_clip[-1]:.4f} fps", flush=True)
    total = time.time() - t_all

    fps = args.clips * F / total
    print(json.dumps({
        "metric": f"serving_steady_state_{args.clips}clip_{F}f_"
                  f"{H}x{W}_{args.steps}step",
        "value": round(fps, 4), "unit": "frames/s",
        "per_clip_s": [round(t, 3) for t in per_clip],
        "vs_baseline": round(fps / 0.87, 4)}), flush=True)


if __name__ == "__main__":
    main()
