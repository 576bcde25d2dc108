"""On-chip A/B of the SDC rasterizer: banded vs brute-force (VERDICT r4 #1).

Times one frame of the SMPL-H body render at the production decomp shape
(6890 verts / 13776 faces -> 720x480) with the REAL mesh topology from
the smpl weights bundle, posed like the motion stage poses it (camera at
the reference demo focal). Steady-state = median of --reps warm calls,
synced with a device scalar fetch (block_until_ready lies under axon).

Round-4 baseline: brute-force full-height kernel = 2.8 s/frame on v5e
(BENCH_NOTES round-4 decomp ledger); self-set target: <= 0.3 s/frame.

Usage: python tools/profile_raster.py [--reps 5] [--band 64]
       [--band-chunk 256] [--height 720] [--width 480] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", default="/tmp/decomp_weights")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--band", type=int, default=64)
    ap.add_argument("--band-chunk", type=int, default=256)
    ap.add_argument("--face-chunk", type=int, default=128,
                    help="brute-force kernel chunk")
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-brute", action="store_true",
                    help="only time the banded kernel")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))),
                          "tests/.jax_cache" if args.cpu
                          else ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from functools import partial
    from mimo_tpu.decomp import renderer as R

    print(f"backend: {jax.default_backend()}", flush=True)

    z = np.load(os.path.join(args.weights_dir, "smpl.npz"))
    verts = np.asarray(z["v_template"], np.float32)          # (6890, 3)
    faces = np.asarray(z["f"], np.int32)                     # (13776, 3)
    H, W = args.height, args.width
    # pose the template the way MotionEstimator frames it: body centered,
    # ~0.7*H tall, z ~ 2 m in front of a focal that fills the frame
    v = verts - verts.mean(0)
    scale = 0.7 * H / (v[:, 1].max() - v[:, 1].min())
    focal = np.float32(scale * 2.0)
    v = v * np.float32(1.0)
    v[:, 2] += 2.0
    colors = np.random.default_rng(0).uniform(
        0.2, 1.0, (verts.shape[0], 3)).astype(np.float32)
    center = np.asarray([W / 2, H / 2], np.float32)

    vj = jnp.asarray(v)
    fj = jnp.asarray(faces)
    cj = jnp.asarray(colors)
    foc = jnp.asarray(focal)
    cen = jnp.asarray(center)

    def sync(t):
        return float(jnp.sum(t[1].astype(jnp.float32)))

    def bench(name, fn):
        t0 = time.time()
        out = fn(vj)
        s = sync(out)
        print(f"  {name}: compile+1st {time.time() - t0:6.2f}s "
              f"(alpha sum {s:.1f})", flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(vj)
            sync(out)
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"  {name}: steady {med * 1e3:8.1f} ms/frame "
              f"(all: {[f'{t*1e3:.0f}' for t in times]})", flush=True)
        return med, out

    banded = jax.jit(partial(
        R.rasterize_banded, faces=fj, colors=cj, focal=foc, center=cen,
        height=H, width=W, face_chunk=args.band_chunk, band=args.band))
    mb, ob = bench(f"banded(band={args.band},chunk={args.band_chunk})",
                   banded)
    print(f"  banded bad-flag: {bool(ob[3])}", flush=True)

    if not args.skip_brute:
        brute = jax.jit(partial(
            R.rasterize, faces=fj, colors=cj, focal=foc, center=cen,
            height=H, width=W, face_chunk=args.face_chunk))
        mf, of = bench(f"brute(chunk={args.face_chunk})", brute)
        # coverage agreement (ties may differ; alpha masks should match)
        a_b = np.asarray(ob[1]) > 0
        a_f = np.asarray(of[1]) > 0
        agree = (a_b == a_f).mean()
        print(f"  alpha-mask agreement: {agree * 100:.3f}%  "
              f"speedup {mf / mb:.1f}x", flush=True)


if __name__ == "__main__":
    main()
