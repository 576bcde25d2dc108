"""Time + profile the individual jitted pieces of the host-loop pipeline
(prepare / one denoise step / decode) at the headline shape."""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


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
    ki = jax.random.split(jax.random.PRNGKey(1), 5)
    ds = cfg.vae.downscale
    ref = (jax.random.uniform(ki[0], (H, W, 3)) * 2 - 1).astype(dtype)
    pose = jax.random.uniform(ki[1], (F, H, W, 3)).astype(dtype)
    bk = (jax.random.uniform(ki[2], (F, H, W, 3)) * 2 - 1).astype(dtype)
    clip_px = jax.random.normal(ki[3], (224, 224, 3)).astype(dtype)
    noise = jax.random.normal(ki[4], (F, H // ds, W // ds, 4)).astype(dtype)

    prepare = jax.jit(lambda p, a, b, c, d: pose2vid.prepare_conditioning(
        p, st, a, b, c, d))
    step = jax.jit(lambda p, cond, lat, i: pose2vid.denoise_one_step(
        p, st, ddim, cond, lat, i, windows, wweights))
    decode = jax.jit(lambda p, z: pose2vid.chunked_apply(
        lambda zz: V.decode(p["vae"], st.cfg.vae, zz), z, st.vae_chunk))

    cond = prepare(params, ref, pose, bk, clip_px)
    sync(cond["pose_fea"])
    t0 = time.perf_counter()
    cond = prepare(params, ref, pose, bk, clip_px)
    sync(cond["pose_fea"])
    print(f"prepare: {time.perf_counter() - t0:.3f}s")

    lat = noise
    lat2 = step(params, cond, lat, jnp.asarray(0))
    sync(lat2)
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        lat = step(params, cond, lat, jnp.asarray(i + 1))
    sync(lat)
    dt = (time.perf_counter() - t0) / n
    print(f"denoise step: {dt:.3f}s -> 30 steps = {dt * 30:.1f}s")

    out = decode(params, lat)
    sync(out)
    t0 = time.perf_counter()
    out = decode(params, lat)
    sync(out)
    print(f"decode: {time.perf_counter() - t0:.3f}s")

    # capture a trace of 2 steps
    trace_dir = "/tmp/step_trace"
    jax.profiler.start_trace(trace_dir)
    lat = step(params, cond, lat, jnp.asarray(7))
    lat = step(params, cond, lat, jnp.asarray(8))
    sync(lat)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no xplane")
        return
    from jax.profiler import ProfileData
    pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    totals = defaultdict(float)      # by base name (op class)
    full = defaultdict(float)        # by full instruction name
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            # async lines (copy-start etc.) overcount; the XLA Ops line is
            # the honest device-time attribution (BENCH_NOTES.md)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                totals[ev.name.split(".")[0]] += ev.duration_ns / 1e6
                full[ev.name.split(" ")[0]] += ev.duration_ns / 1e6
    print(f"2-step XLA-Ops sum: {sum(totals.values()):.0f} ms")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:16]:
        print(f"{ms:9.1f} ms  {name}")
    print("--- top individual instructions ---")
    for name, ms in sorted(full.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:9.1f} ms  {name[:140]}")


if __name__ == "__main__":
    main()
