"""Dump the optimized HLO of the denoise-step executable and summarize the
named fusions the profiler reports (what each top fusion actually computes).

Usage: python tools/dump_step_hlo.py [fusion_name ...]
Writes the full text to /tmp/step_hlo.txt and prints the root expression of
each requested fusion (default: every fusion whose name appears in the
latest profile's top list is easiest to paste as args).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from mimo_tpu import config as C
    from mimo_tpu.models import unet as U
    from mimo_tpu.models import vae as V
    from mimo_tpu.models import clip_vision as CV
    from mimo_tpu.models import pose_guider as PG
    from mimo_tpu.pipelines import pose2vid
    from mimo_tpu.schedulers.ddim import DDIM

    F, H, W = 24, 512, 784
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
    st = pose2vid.Pose2VideoStatic(cfg=cfg, num_frames=F, height=H, width=W,
                                   num_inference_steps=30,
                                   guidance_scale=3.5)
    ddim = DDIM.create(cfg.pipeline.scheduler, 30)
    windows, wweights = pose2vid.make_windows(st)
    ds = cfg.vae.downscale
    ki = jax.random.split(jax.random.PRNGKey(1), 5)
    ref = (jax.random.uniform(ki[0], (H, W, 3)) * 2 - 1).astype(dtype)
    pose = jax.random.uniform(ki[1], (F, H, W, 3)).astype(dtype)
    bk = (jax.random.uniform(ki[2], (F, H, W, 3)) * 2 - 1).astype(dtype)
    clip_px = jax.random.normal(ki[3], (224, 224, 3)).astype(dtype)
    noise = jax.random.normal(ki[4], (F, H // ds, W // ds, 4)).astype(dtype)

    prepare = jax.jit(lambda p, a, b, c, d: pose2vid.prepare_conditioning(
        p, st, a, b, c, d))
    cond_shape = jax.eval_shape(prepare, params, ref, pose, bk, clip_px)
    cond = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), cond_shape)

    step = jax.jit(lambda p, cond, lat, i: pose2vid.denoise_one_step(
        p, st, ddim, cond, lat, i, windows, wweights))
    lowered = step.lower(params, cond, noise, jnp.asarray(0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    open("/tmp/step_hlo.txt", "w").write(txt)
    print(f"wrote /tmp/step_hlo.txt ({len(txt)} bytes)")

    names = sys.argv[1:]
    if not names:
        return
    lines = txt.splitlines()
    for want in names:
        for i, ln in enumerate(lines):
            s = ln.strip()
            if s.startswith(f"%{want} ") or s.startswith(f"{want} ") or \
               f" {want} = " in s or s.startswith(f"%{want}."):
                print("=" * 80)
                print(s[:600])


if __name__ == "__main__":
    main()
