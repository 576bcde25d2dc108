"""Profile the exact bench.py generate program (compile-cache hit) and
print top device ops from the captured xplane."""

import glob
import os
import sys
from collections import defaultdict

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
    st = pose2vid.Pose2VideoStatic(cfg=cfg, num_frames=F, height=H, width=W,
                                   num_inference_steps=steps,
                                   guidance_scale=3.5)
    ki = jax.random.split(jax.random.PRNGKey(1), 5)
    ds = cfg.vae.downscale
    ref = (jax.random.uniform(ki[0], (H, W, 3)) * 2 - 1).astype(dtype)
    pose = jax.random.uniform(ki[1], (F, H, W, 3)).astype(dtype)
    bk = (jax.random.uniform(ki[2], (F, H, W, 3)) * 2 - 1).astype(dtype)
    clip_px = jax.random.normal(ki[3], (224, 224, 3)).astype(dtype)
    noise = jax.random.normal(ki[4], (F, H // ds, W // ds, 4)).astype(dtype)

    fn = jax.jit(lambda p, a, b, c, d, e: pose2vid.generate_fn(
        p, st, a, b, c, d, e))

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    sync(fn(params, ref, pose, bk, clip_px, noise))  # compile (cached)

    trace_dir = "/tmp/bench_trace"
    jax.profiler.start_trace(trace_dir)
    sync(fn(params, ref, pose, bk, clip_px, noise))
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    print("xplanes:", paths)
    if not paths:
        return
    from jax.profiler import ProfileData
    pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    totals = defaultdict(float)
    plane_names = []
    for plane in pd.planes:
        plane_names.append(plane.name)
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                # strip instruction suffixes
                base = name.split(".")[0]
                totals[base] += ev.duration_ns / 1e6
    print("planes:", plane_names)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
    print(f"sum of events: {sum(totals.values()):.0f} ms")
    for name, ms in top:
        print(f"{ms:10.1f} ms  {name}")


if __name__ == "__main__":
    main()
