"""Per-stage wall-clock profile of the decomposition half (VERDICT r2 #5).

Runs every decomp stage at realistic resolution with real-architecture
models (random weights via tools/gen_decomp_weights.py — identical FLOPs
to the published checkpoints) and prints a stage ledger:

  track      first-frame SAM segment + SAM2 video propagation
  pose       ViTPose wholebody per frame (flip-test)
  motion     HMR2 + HaMeR + SMPL-H LBS + SDC rasterization per frame
  bk         RAFT flows + ProPainter inpaint (480p working size)
  occ        SAM automask + DepthAnythingV2 per keyframe

Gating decisions (person detection, full-body check, occluder thresholds)
are bypassed with synthetic masks/boxes — random weights would reject
everything and skip the compute this tool exists to measure.

Usage:
  python tools/profile_decomp.py --weights-dir /tmp/decomp_weights \
      [--tiny] [--cpu] [--frames 48] [--height 720] [--width 480]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_frames(T, H, W, seed=0):
    """Moving person-ish figure over a textured background."""
    rng = np.random.default_rng(seed)
    bg = (rng.uniform(40, 200, (H, W, 3))).astype(np.uint8)
    frames, masks, boxes = [], [], []
    pw, ph = W // 4, int(H * 0.7)
    for t in range(T):
        f = bg.copy()
        x0 = int((W - pw) * (0.2 + 0.6 * t / max(1, T - 1)))
        y0 = int(H * 0.15)
        f[y0:y0 + ph, x0:x0 + pw] = (180, 140, 110)
        f[y0:y0 + ph // 5, x0 + pw // 4:x0 + 3 * pw // 4] = (210, 170, 140)
        m = np.zeros((H, W), bool)
        m[y0:y0 + ph, x0:x0 + pw] = True
        frames.append(f)
        masks.append(m)
        boxes.append([x0, y0, x0 + pw, y0 + ph])
    return frames, np.stack(masks), np.asarray(boxes, np.int64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", default="/tmp/decomp_weights")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--stages", default="track,pose,motion,bk,occ")
    ap.add_argument("--trace", action="store_true",
                    help="xplane-trace each stage and print its top ops")
    ap.add_argument("--steady", action="store_true",
                    help="run each stage twice in-process on different "
                         "clips and ledger the second run: the serving "
                         "steady state, without the one-time weight "
                         "upload + compile-cache load the first call of "
                         "each program blocks on")
    args = ap.parse_args()

    stages = args.stages.split(",")
    if len(stages) > 1:
        # One subprocess per stage: the full zoo is ~6 GB of bf16 device
        # weights — loading everything at once OOMed a 16 GB v5e the first
        # time the real-chip ledger ran (round 4). Each stage loads only
        # its own bundles (STAGE_BUNDLES) and frees the chip on exit.
        import subprocess
        rc = 0
        for s in stages:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--weights-dir", args.weights_dir, "--stages", s,
                   "--frames", str(args.frames),
                   "--height", str(args.height), "--width", str(args.width)]
            if args.tiny:
                cmd.append("--tiny")
            if args.cpu:
                cmd.append("--cpu")
            if args.trace:
                cmd.append("--trace")
            if args.steady:
                cmd.append("--steady")
            r = subprocess.call(cmd)
            rc = rc or r
        raise SystemExit(rc)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))),
                          ".jax_cache_tpu" if not args.cpu
                          else "tests/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"backend: {jax.default_backend()}", flush=True)

    from mimo_tpu.decomp.factory import build_decomp_models
    from mimo_tpu.decomp import pipeline as DP

    STAGE_BUNDLES = {
        "track": {"sam", "sam2"},
        "pose": {"vitpose"},
        "motion": {"vitpose", "hmr", "hamer"},  # smpl: small host arrays
        "bk": {"raft", "propainter"},
        "occ": {"sam", "depth"},
    }
    only = set().union(*(STAGE_BUNDLES.get(s, set()) for s in stages))

    T0 = time.time()
    models = build_decomp_models(args.weights_dir, tiny=args.tiny, only=only)
    print(f"[{time.time() - T0:7.1f}s] models loaded ({sorted(only)})",
          flush=True)

    T, H, W = args.frames, args.height, args.width
    frames, masks, boxes = synth_frames(T, H, W)
    data2 = synth_frames(T, H, W, seed=1) if args.steady else None
    ledger = {}

    def _print_trace(name, trace_dir):
        import glob
        from collections import defaultdict
        paths = sorted(glob.glob(os.path.join(trace_dir, "**",
                                              "*.xplane.pb"),
                                 recursive=True))
        if not paths:
            print(f"  [{name}] no xplane written", flush=True)
            return
        from jax.profiler import ProfileData
        pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
        totals = defaultdict(float)
        counts = defaultdict(int)
        for plane in pd.planes:
            if "TPU" not in plane.name and "CPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    key = ev.name.split(".")[0]
                    totals[key] += ev.duration_ns / 1e6
                    counts[key] += 1
        print(f"  [{name}] xplane XLA-Ops sum {sum(totals.values()):.0f} ms;"
              f" top 15:", flush=True)
        for nm, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:15]:
            print(f"    {ms:10.1f} ms  x{counts[nm]:<6d} {nm}", flush=True)

    def stage(name, fn):
        """fn(frames, masks, boxes). With --steady the stage runs again on
        a different synthetic clip and the second wall time is ledgered
        separately (programs warm, weights resident — the serving state)."""
        if name not in stages:
            return None
        trace_dir = None
        if args.trace:
            trace_dir = f"/tmp/decomp_trace_{name}"
            jax.profiler.start_trace(trace_dir)
        t = time.time()
        try:
            out = fn(frames, masks, boxes)
        except Exception as e:
            dt = time.time() - t
            import traceback
            if trace_dir:
                jax.profiler.stop_trace()
            ledger[name] = (dt, f"FAILED {type(e).__name__}: {str(e)[:200]}")
            print(f"[{time.time() - T0:7.1f}s] {name}: FAILED after "
                  f"{dt:.1f}s — {type(e).__name__}: {str(e)[:2000]}",
                  flush=True)
            traceback.print_exc()
            return None
        dt = time.time() - t
        if trace_dir:
            jax.profiler.stop_trace()
        ledger[name] = (dt, "ok")
        print(f"[{time.time() - T0:7.1f}s] {name}: {dt:.1f}s "
              f"({dt / T * 1000:.0f} ms/frame)", flush=True)
        if trace_dir:
            _print_trace(name, trace_dir)
        if args.steady:
            t = time.time()
            try:
                fn(*data2)
                dt = time.time() - t
                ledger[name + "/steady"] = (dt, "ok")
                print(f"[{time.time() - T0:7.1f}s] {name}/steady: "
                      f"{dt:.1f}s ({dt / T * 1000:.0f} ms/frame)",
                      flush=True)
            except Exception as e:
                dt = time.time() - t
                import traceback
                ledger[name + "/steady"] = (
                    dt, f"FAILED {type(e).__name__}: {str(e)[:200]}")
                print(f"[{time.time() - T0:7.1f}s] {name}/steady: FAILED "
                      f"after {dt:.1f}s — {type(e).__name__}", flush=True)
                traceback.print_exc()
        return out

    # --- track: first-frame SAM + SAM2 propagation ----------------------
    if models.segment_box is not None:
        stage("track", lambda fr, ms, bx: (
            models.segment_box(fr[0], bx[0]),
            models.track_video(fr, ms[0], 0)
            if models.track_video else None))

    # --- pose: ViTPose, whole clip batched (8-frame padded batches) ------
    if models.estimate_pose_batch is not None:
        stage("pose", lambda fr, ms, bx: models.estimate_pose_batch(fr, bx))
    elif models.estimate_pose is not None:
        stage("pose", lambda fr, ms, bx: [
            models.estimate_pose(fr[i], bx[i]) for i in range(T)])

    # --- motion: HMR/HaMeR/SMPL/render ----------------------------------
    if models.estimate_motion is not None:
        stage("motion",
              lambda fr, ms, bx: models.estimate_motion(fr, ms, bx))

    # --- bk: RAFT + ProPainter ------------------------------------------
    if models.inpaint is not None:
        vp = DP.VideoProcessor(models, DP.DecompConfig())
        stage("bk", lambda fr, ms, bx: vp.get_bk_recover(fr, ms))

    # --- occ: automask + depth on keyframes -----------------------------
    def occ_stage(fr, ms, bx):
        outs = []
        for kf in (0, T // 2):
            if models.automask is not None:
                outs.append(("automask", len(models.automask(fr[kf]))))
            if models.depth is not None:
                outs.append(("depth", models.depth(fr[kf]).shape))
        return outs

    if models.automask is not None or models.depth is not None:
        stage("occ", occ_stage)

    print("\n== decomp stage ledger "
          f"({T}f {H}x{W}, {jax.default_backend()}) ==")
    for name, (dt, status) in ledger.items():
        print(f"  {name:14s} {dt:8.1f}s   {status}")


if __name__ == "__main__":
    main()
