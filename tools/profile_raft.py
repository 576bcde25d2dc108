"""xplane attribution of the jitted RAFT bidirectional-flow program
(round-5: raft_bi measured 45.6 s steady for a 12-frame 720x480 clip —
~20x the reference's A100 wall — with no attribution; VERDICT r4 weak #3
says decomp stages get the same profile discipline as the denoise step).

Usage: python tools/profile_raft.py [--frames 12] [--height 720]
       [--width 480] [--iters N] [--top 30]
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
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--iters", type=int, default=0,
                    help="override cfg.iters (0 = default 20)")
    ap.add_argument("--top", type=int, default=30)
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

    import dataclasses
    from mimo_tpu.decomp import raft as RAFT
    from mimo_tpu.decomp.factory import _maybe

    rcfg = RAFT.RAFTConfig()
    if args.iters:
        rcfg = dataclasses.replace(rcfg, iters=args.iters)
    rp = _maybe(os.path.join(args.weights_dir, "raft.npz"), jnp.bfloat16)
    assert rp is not None, "need /tmp/decomp_weights/raft.npz"

    T, H, W = args.frames, args.height, args.width
    fr = (jax.random.uniform(jax.random.PRNGKey(0), (T, H, W, 3),
                             jnp.bfloat16) * 2 - 1)

    def sync(out):
        return [float(jnp.sum(x.astype(jnp.float32)))
                for x in jax.tree.leaves(out)]

    t = time.time()
    out = RAFT.raft_bi(rp, rcfg, fr)
    sync(out)
    print(f"compile+1st: {time.time() - t:.1f}s", flush=True)
    t = time.time()
    sync(RAFT.raft_bi(rp, rcfg, fr))
    steady = time.time() - t
    print(f"steady: {steady:.2f}s", flush=True)

    trace_dir = "/tmp/raft_trace"
    jax.profiler.start_trace(trace_dir)
    sync(RAFT.raft_bi(rp, rcfg, fr))
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
