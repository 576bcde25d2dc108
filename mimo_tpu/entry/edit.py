"""Video character editing (run_edit.py equivalent): ROI-clip the template,
generate, paste back with feather masks, occlusion compositing, overlap
cross-fade.

CLI: python -m mimo_tpu.entry.edit --ref ref.png --template dir/ \
        --output out.mp4 [--weights bundle.npz]
"""

from __future__ import annotations

import argparse
from typing import List, Optional

import numpy as np

from mimo_tpu.config import MIMOConfig
from mimo_tpu.entry.runner import Runner, init_random_params, load_params, \
    prep_reference_image
from mimo_tpu.entry.template import load_template
from mimo_tpu.utils import frames as FU
from mimo_tpu.utils import video_io as VIO

OVERLAY = 4  # shot cross-fade frames (run_edit.py:216)


def composite_back(video: np.ndarray, context_list, bbox_clip_list,
                   pad_info, bk_ori, vid_ori, occ_ori,
                   overlay: int = OVERLAY) -> List[np.ndarray]:
    """Paste generated crops back into the full frames
    (run_edit.py:253-304): unpad → place at shot bbox → feathered blend onto
    the original background → occlusion alpha-over of the source video →
    linear cross-fade on shot-overlap frames."""
    n_total = len(bk_ori)
    res: List[Optional[np.ndarray]] = [None] * n_total
    video_idx = 0
    for k, context in enumerate(context_list):
        start_i = context[0]
        bbox = bbox_clip_list[k]
        for i in context:
            bk_image = bk_ori[i].astype(np.float32)
            fh, fw = bk_image.shape[:2]
            pad_h, pad_w, padding_v = pad_info[video_idx]
            frame = video[video_idx]  # (H, W, 3) float [0,1]
            frame = FU.resize_frame((frame * 255).astype(np.uint8),
                                    pad_w, pad_h)
            top, bottom, left, right = padding_v
            frame = frame[top:pad_h - bottom, left:pad_w - right]

            w_min, w_max, h_min, h_max = bbox
            canvas = np.full((fh, fw, 3), 255, np.float32)
            ch, cw = frame.shape[:2]
            canvas[h_min:h_min + ch, w_min:w_min + cw] = frame

            mask_full = np.zeros((fh, fw), np.float32)
            feather = FU.get_feather_mask(bbox, (fw, fh), (ch, cw))
            mask_full[h_min:h_min + ch, w_min:w_min + cw] = feather

            out = canvas * mask_full[..., None] + \
                bk_image * (1 - mask_full[..., None])

            if occ_ori is not None:
                occ = occ_ori[i][..., 0].astype(np.float32) / 255.0
                out = out * (1 - occ[..., None]) + \
                    vid_ori[i].astype(np.float32) * occ[..., None]

            if res[i] is None:
                res[i] = out
            else:
                factor = (i - start_i + 1) / (overlay + 1)
                res[i] = res[i] * (1 - factor) + out * factor
            video_idx += 1
    return [np.clip(r, 0, 255).astype(np.uint8) for r in res
            if r is not None]


def edit(runner: Runner, ref_img: np.ndarray, template_path: str, *,
         width: int = 784, height: int = 784, steps: int = 25,
         cfg_scale: float = 3.5, seed: int = 42,
         max_frames: int = 150) -> List[np.ndarray]:
    tpl = load_template(template_path, max_frames=max_frames, require_bk=True)
    ref = prep_reference_image(ref_img)

    bk_ori = list(tpl.bk)
    vid_ori = list(tpl.vid) if tpl.vid else list(tpl.bk)
    occ_ori = list(tpl.occ) if tpl.occ is not None else None

    pose_c, vid_c, bk_c, bbox_clip, context_list, bbox_clip_list = \
        FU.crop_human_clip_auto_context(tpl.sdc, vid_ori, tpl.bk, OVERLAY)

    pose_in, bk_in, pad_info = [], [], []
    for p, b in zip(pose_c, bk_c):
        pp, _ = FU.pad_img(p, (0, 0, 0))
        bb, padding_v = FU.pad_img(b, (255, 255, 255))
        pose_in.append(pp)
        bk_in.append(bb)
        pad_info.append((bb.shape[0], bb.shape[1], padding_v))

    video = runner.generate(ref, pose_in, bk_in, width=width, height=height,
                            steps=steps, cfg_scale=cfg_scale, seed=seed)

    return composite_back(video, context_list, bbox_clip_list, pad_info,
                          bk_ori, vid_ori, occ_ori)


def main(argv=None):
    ap = argparse.ArgumentParser(description="MIMO-TPU video character edit")
    ap.add_argument("--ref", required=True)
    ap.add_argument("--template", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--W", type=int, default=784)
    ap.add_argument("--H", type=int, default=784)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--cfg", type=float, default=3.5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-frames", type=int, default=150)
    args = ap.parse_args(argv)

    # validate inputs before the (slow) model init
    load_template(args.template, max_frames=1, require_bk=True)
    ref = VIO.load_image(args.ref)

    cfg = MIMOConfig()
    params = (load_params(args.weights) if args.weights
              else init_random_params(cfg))
    runner = Runner(cfg=cfg, params=params)
    frames = edit(runner, ref, args.template, width=args.W, height=args.H,
                  steps=args.steps, cfg_scale=args.cfg, seed=args.seed,
                  max_frames=args.max_frames)
    fps = load_template(args.template, max_frames=1).fps
    VIO.save_video(frames, args.output, fps=fps)
    print(f"saved {len(frames)} frames to {args.output}")


if __name__ == "__main__":
    main()
