"""xplane attribution of the jitted ProPainter flow-completion and image
-propagation programs (round 5: the 23f flow program crashed the axon
worker — execution watchdog — before any steady-state number existed).

Usage: python tools/profile_flow.py [--frames 8] [--height 720]
       [--width 480] [--prog flow|img] [--top 30] [--cpu]
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--prog", default="flow", choices=["flow", "img"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--notrace", action="store_true")
    ap.add_argument("--weights-dir", default="/tmp/decomp_weights")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, "tests/.jax_cache" if args.cpu
                                   else ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    print(f"backend: {jax.default_backend()}", flush=True)

    from mimo_tpu.decomp import propainter as PP
    from mimo_tpu.decomp.factory import _maybe

    pcfg = PP.ProPainterConfig()
    pp = _maybe(os.path.join(args.weights_dir, "propainter.npz"),
                jnp.bfloat16)
    assert pp is not None, "need /tmp/decomp_weights/propainter.npz"

    FL, H, W = args.frames, args.height, args.width
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    dtype = jnp.bfloat16

    def sync(out):
        return [float(jnp.sum(x.astype(jnp.float32)))
                for x in jax.tree.leaves(out)]

    if args.prog == "flow":
        flows_f = jax.random.normal(ks[1], (FL, H, W, 2), dtype) * 2
        flows_b = jax.random.normal(ks[2], (FL, H, W, 2), dtype) * 2
        masks = (jax.random.uniform(ks[3], (FL + 1, H, W, 1)) > 0.8
                 ).astype(dtype)
        fn = lambda: PP.forward_bidirect_flow(pp["flow"], pcfg, flows_f,
                                              flows_b, masks)
    else:
        T = FL
        frames = (jax.random.uniform(ks[0], (T, H, W, 3), dtype) * 2 - 1)
        fl_f = jax.random.normal(ks[1], (T - 1, H, W, 2), dtype) * 2
        fl_b = jax.random.normal(ks[2], (T - 1, H, W, 2), dtype) * 2
        m = (jax.random.uniform(ks[3], (T, H, W, 1)) > 0.8).astype(dtype)
        fn = lambda: PP.img_propagation(frames, fl_f, fl_b, m)

    t = time.time()
    sync(fn())
    print(f"{args.prog} ({FL}f): compile+1st {time.time() - t:.1f}s",
          flush=True)
    t = time.time()
    sync(fn())
    print(f"{args.prog} ({FL}f): steady {time.time() - t:.2f}s", flush=True)

    if args.notrace:
        return
    trace_dir = f"/tmp/{args.prog}_trace"
    jax.profiler.start_trace(trace_dir)
    sync(fn())
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no xplane written", flush=True)
        return
    from jax.profiler import ProfileData
    pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    totals = defaultdict(float)
    counts = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                key = ev.name.split(".")[0]
                totals[key] += ev.duration_ns / 1e6
                counts[key] += 1
    print(f"xplane XLA-Ops sum {sum(totals.values()):.0f} ms; "
          f"top {args.top}:")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms:10.1f} ms  x{counts[name]:<6d} {name}")


if __name__ == "__main__":
    main()
