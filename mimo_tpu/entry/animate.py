"""Character image animation (run_animate.py equivalent): sdc-only template,
white background, global human crop, raw pipeline output.

CLI: python -m mimo_tpu.entry.animate --ref ref.png --template dir/ \
        --output out.mp4 [--weights bundle.npz] [--W 784 --H 784 ...]
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np

from mimo_tpu.config import MIMOConfig
from mimo_tpu.entry.runner import Runner, init_random_params, load_params, \
    prep_reference_image
from mimo_tpu.entry.template import load_template
from mimo_tpu.utils import frames as FU
from mimo_tpu.utils import video_io as VIO


def animate(runner: Runner, ref_img: np.ndarray, template_path: str, *,
            width: int = 784, height: int = 784, steps: int = 25,
            cfg_scale: float = 3.5, seed: int = 42,
            max_frames: int = 150,
            interpolation_factor: int = 0) -> np.ndarray:
    """Returns (F, height, width, 3) float video in [0, 1]
    (run_animate.py:152-226 semantics: white bk via init_bk, global
    crop_human, no paste-back)."""
    tpl = load_template(template_path, max_frames=max_frames)
    ref = prep_reference_image(ref_img)

    pose_frames = tpl.sdc
    h, w = pose_frames[0].shape[:2]
    bk_frames = FU.init_bk(len(pose_frames), h, w)

    pose_frames, bk_frames, _ = FU.crop_human(pose_frames, bk_frames)

    padded_pose, padded_bk = [], []
    for p, b in zip(pose_frames, bk_frames):
        pp, _ = FU.pad_img(p, (0, 0, 0))
        bb, _ = FU.pad_img(b, (255, 255, 255))
        padded_pose.append(pp)
        padded_bk.append(bb)

    return runner.generate(ref, padded_pose, padded_bk, width=width,
                           height=height, steps=steps, cfg_scale=cfg_scale,
                           seed=seed,
                           interpolation_factor=interpolation_factor)


def main(argv=None):
    ap = argparse.ArgumentParser(description="MIMO-TPU character animation")
    ap.add_argument("--ref", required=True)
    ap.add_argument("--template", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--weights", default=None,
                    help=".npz bundle from weights/convert.py "
                         "(random init if omitted — smoke-test mode)")
    ap.add_argument("--W", type=int, default=784)
    ap.add_argument("--H", type=int, default=784)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--cfg", type=float, default=3.5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-frames", type=int, default=150)
    ap.add_argument("--interp", type=int, default=0,
                    help="latent interpolation factor (frame-rate "
                         "upsampling; reference pipeline "
                         "interpolation_factor)")
    args = ap.parse_args(argv)

    # validate inputs before the (slow) model init
    tpl_probe = load_template(args.template, max_frames=1)
    ref = VIO.load_image(args.ref)

    cfg = MIMOConfig()
    params = (load_params(args.weights) if args.weights
              else init_random_params(cfg))
    runner = Runner(cfg=cfg, params=params)
    video = animate(runner, ref, args.template, width=args.W, height=args.H,
                    steps=args.steps, cfg_scale=args.cfg, seed=args.seed,
                    max_frames=args.max_frames,
                    interpolation_factor=args.interp)
    fps = load_template(args.template, max_frames=1).fps
    VIO.save_video(video, args.output, fps=fps)
    print(f"saved {video.shape[0]} frames to {args.output}")


if __name__ == "__main__":
    main()
