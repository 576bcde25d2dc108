"""Profile the jitted ProPainter bk-stage programs at the round-4 ledger
workload shapes (48f 720x480 default) — compile + steady-state per
program, with optional xplane top-op attribution for inpaint_forward.

The round-4 real-chip ledger measured the bk stage at 2753.8 s, with
inpaint windows ~68 s each — those numbers were EAGER (per-op dispatch
through the ~35 ms axon tunnel). This tool times the whole-program jits
(propainter.py/raft.py round 4) that replace that path.

Usage: python tools/profile_inpaint.py [--cpu] [--tiny] [--trace]
       [--height 720] [--width 480] [--skip raft,flow,img,inpaint]
       [--weights-dir /tmp/decomp_weights]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--trace", action="store_true",
                    help="xplane-trace inpaint_forward and print top ops")
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--skip", default="")
    ap.add_argument("--weights-dir", default="/tmp/decomp_weights",
                    help="load propainter.npz/raft.npz from here when "
                         "present (random init of the full-size models "
                         "ON the TPU pays a 5-15 s remote compile per "
                         "unique init op — tens of minutes)")
    ap.add_argument("--one", default="",
                    help="internal: run only this program in-process")
    args = ap.parse_args()

    ALL = ["raft", "flow", "img", "inpaint"]
    if not args.one:
        # one subprocess per program: a TPU-worker crash in one program
        # (execution watchdog, OOM) must not lose the others' numbers —
        # round-5 first run died at flow and never measured img/inpaint
        import subprocess
        skip = set(args.skip.split(",")) if args.skip else set()
        rc = 0
        for prog in ALL:
            if prog in skip:
                continue
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--one", prog, "--height", str(args.height),
                   "--width", str(args.width),
                   "--weights-dir", args.weights_dir]
            if args.cpu:
                cmd.append("--cpu")
            if args.tiny:
                cmd.append("--tiny")
            if args.trace and prog == "inpaint":
                cmd.append("--trace")
            r = subprocess.call(cmd)
            rc = rc or r
        raise SystemExit(rc)
    args.skip = ",".join(p for p in ALL if p != args.one)

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
    from mimo_tpu.decomp import raft as RAFT

    skip = set(args.skip.split(",")) if args.skip else set()
    H, W = args.height, args.width
    if args.tiny:
        H, W = 128, 96
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    pcfg = PP.tiny_propainter_config() if args.tiny else PP.ProPainterConfig()
    rcfg = RAFT.tiny_raft_config() if args.tiny else RAFT.RAFTConfig()

    t0 = time.time()
    pp_path = os.path.join(args.weights_dir, "propainter.npz")
    rp_path = os.path.join(args.weights_dir, "raft.npz")
    if not args.tiny and os.path.exists(pp_path) and os.path.exists(rp_path):
        from mimo_tpu.decomp.factory import _maybe
        pp = _maybe(pp_path, dtype)
        rp = _maybe(rp_path, dtype)
        print(f"[{time.time() - t0:6.1f}s] params loaded from "
              f"{args.weights_dir}", flush=True)
    else:
        # tiny / no bundles: init on CPU (eager full-size init on the TPU
        # compiles every unique op shape remotely), then transfer
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            pp = jax.tree.map(lambda x: np.asarray(x).astype(np.float32),
                              PP.propainter_init(key, pcfg))
            rp = jax.tree.map(lambda x: np.asarray(x).astype(np.float32),
                              RAFT.raft_init(key, rcfg))
        pp = jax.tree.map(lambda x: jnp.asarray(x, dtype), pp)
        rp = jax.tree.map(lambda x: jnp.asarray(x, dtype), rp)
        print(f"[{time.time() - t0:6.1f}s] params ready", flush=True)

    def sync(out):
        leaves = jax.tree.leaves(out)
        return [float(jnp.sum(x.astype(jnp.float32))) for x in leaves]

    def run(name, fn):
        t = time.time()
        out = fn()
        sync(out)
        tc = time.time() - t
        t = time.time()
        out = fn()
        sync(out)
        ts = time.time() - t
        print(f"  {name:28s} compile+1st {tc:8.2f}s   steady {ts:8.3f}s",
              flush=True)
        return out

    ks = jax.random.split(key, 8)
    # ---- RAFT clip (W<=640 -> clip 12, infer.py:407-439) ----
    if "raft" not in skip:
        clip = 12
        fr = (jax.random.uniform(ks[0], (clip, H, W, 3), dtype) * 2 - 1)
        run(f"raft_bi ({clip}f)", lambda: RAFT.raft_bi(rp, rcfg, fr))

    # ---- flow completion chunk ----
    fc_chunk = max(8, min(pcfg.subvideo_length, int(2.4e9 // (H * W * 500))))
    FL = min(fc_chunk + 10, 47)
    flows_f = jax.random.normal(ks[1], (FL, H, W, 2), dtype) * 2
    flows_b = jax.random.normal(ks[2], (FL, H, W, 2), dtype) * 2
    masks = (jax.random.uniform(ks[3], (FL + 1, H, W, 1)) > 0.8
             ).astype(dtype)
    if "flow" not in skip:
        run(f"forward_bidirect_flow ({FL}f)",
            lambda: PP.forward_bidirect_flow(pp["flow"], pcfg, flows_f,
                                             flows_b, masks))

    # ---- image propagation (48f full clip) ----
    T = 48 if not args.tiny else 8
    frames = (jax.random.uniform(ks[4], (T, H, W, 3), dtype) * 2 - 1)
    fl_f = jax.random.normal(ks[5], (T - 1, H, W, 2), dtype) * 2
    fl_b = jax.random.normal(ks[6], (T - 1, H, W, 2), dtype) * 2
    m48 = (jax.random.uniform(ks[7], (T, H, W, 1)) > 0.8).astype(dtype)
    if "img" not in skip:
        run(f"img_propagation ({T}f)",
            lambda: PP.img_propagation(frames, fl_f, fl_b, m48))

    # ---- inpaint window (neighbor 11 + 4 refs, the ledger's shape) ----
    lt = 11 if not args.tiny else 4
    Tw = lt + (4 if not args.tiny else 2)
    mf = frames[:Tw]
    wff, wfb = fl_f[:lt - 1], fl_b[:lt - 1]
    mi, mu = m48[:Tw], m48[:Tw]

    def inpaint():
        return PP.inpaint_forward(pp["gen"], pcfg, mf, wff, wfb, mi, mu, lt)

    if "inpaint" not in skip:
        run(f"inpaint_forward ({Tw}f lt={lt})", inpaint)

        if args.trace:
            trace_dir = "/tmp/inpaint_trace"
            jax.profiler.start_trace(trace_dir)
            sync(inpaint())
            jax.profiler.stop_trace()
            paths = sorted(glob.glob(os.path.join(
                trace_dir, "**", "*.xplane.pb"), recursive=True))
            if paths:
                from jax.profiler import ProfileData
                pd = ProfileData.from_serialized_xspace(
                    open(paths[-1], "rb").read())
                totals = defaultdict(float)
                for plane in pd.planes:
                    if "TPU" not in plane.name:
                        continue
                    for line in plane.lines:
                        if line.name != "XLA Ops":
                            continue
                        for ev in line.events:
                            totals[ev.name.split(".")[0]] += \
                                ev.duration_ns / 1e6
                print(f"  xplane sum {sum(totals.values()):.0f} ms; top ops:")
                for name, ms in sorted(totals.items(),
                                       key=lambda kv: -kv[1])[:25]:
                    print(f"  {ms:10.1f} ms  {name}")


if __name__ == "__main__":
    main()
