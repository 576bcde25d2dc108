"""Benchmark: frames/sec/chip for the MIMO denoise workload on TPU.

Workload (BASELINE.json north star): a 24-frame 512x784 clip at 30 DDIM
steps — i.e. 30 × (CFG pair of) UNet3D forwards over one 24-frame window at
latent 64x98, plus the reference-UNet pass, pose guider, VAE encodes and
decodes. This bench measures the full generate() program (end-to-end device
time) with SD1.5-sized weights (randomly initialized — identical FLOPs to
real weights).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); we compare
against an analytic A100 estimate for the same workload: the reference
pipeline runs batch-1 fp16 UNet windows sequentially; an A100 at ~60%% MXU
utilization on the ~5.1 TFLOP/clip-step UNet workload yields ≈0.8-1.0
frames/sec for this clip shape (25-30 s / 24 frames). We report
vs_baseline = ours / 0.87 fps.
"""

import json
import os
import time

import numpy as np

# Allow running under pytest-free, real-TPU env. Use bf16 params for speed.
import jax
import jax.numpy as jnp

# persistent compile cache: the full generate() program takes tens of
# minutes to compile cold on this stack; cached reruns start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from mimo_tpu import config as C
    from mimo_tpu.models import unet as U
    from mimo_tpu.models import vae as V
    from mimo_tpu.models import clip_vision as CV
    from mimo_tpu.models import pose_guider as PG
    from mimo_tpu.pipelines import pose2vid

    F, H, W = 24, 512, 784
    steps = 30
    dtype = jnp.bfloat16

    cfg = C.MIMOConfig()
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    params = {
        "reference_unet": U.unet_init(ks[0], cfg.reference_unet, dtype=dtype),
        "denoising_unet": U.unet_init(ks[1], cfg.denoising_unet, dtype=dtype),
        "pose_guider": PG.pose_guider_init(ks[2], cfg.pose_guider, dtype=dtype),
        "vae": V.vae_init(ks[3], cfg.vae, dtype=dtype),
        "clip": CV.clip_vision_init(ks[4], cfg.clip_vision, dtype=dtype),
    }

    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W,
        num_inference_steps=steps, guidance_scale=3.5, vae_chunk=8)

    ki = jax.random.split(jax.random.PRNGKey(1), 5)
    ds = cfg.vae.downscale
    ref = (jax.random.uniform(ki[0], (H, W, 3)) * 2 - 1).astype(dtype)
    pose = jax.random.uniform(ki[1], (F, H, W, 3)).astype(dtype)
    bk = (jax.random.uniform(ki[2], (F, H, W, 3)) * 2 - 1).astype(dtype)
    clip_px = jax.random.normal(ki[3], (224, 224, 3)).astype(dtype)
    noise = jax.random.normal(ki[4], (F, H // ds, W // ds, 4)).astype(dtype)

    cache = {}

    def run():
        return pose2vid.generate_host_loop(params, st, ref, pose, bk,
                                           clip_px, noise, jit_cache=cache)

    def sync(x):
        # block_until_ready does not reliably block under the axon tunnel;
        # a scalar device reduction + host fetch does
        return float(jnp.sum(x.astype(jnp.float32)))

    # compile + warmup
    sync(run())

    t0 = time.perf_counter()
    sync(run())
    dt = time.perf_counter() - t0

    fps = F / dt
    baseline_fps = 0.87  # analytic A100 estimate, see module docstring
    print(json.dumps({
        "metric": "frames_per_sec_per_chip_24f_512x784_30step",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 4),
    }))


if __name__ == "__main__":
    main()
