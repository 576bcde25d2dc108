"""Template-extraction orchestrator: in-the-wild video → template dir
(vid/mask/sdc/bk/occ + bbox.npy + config.json).

Reference: video_decomp/run.py:280-1055 `VideoProcessor` — five stages:
  get_human (detector + SAM first mask + SAM2 track, :362-530)
  get_bbox   (per-frame mask bbox, :532-545)
  get_motion (ViTPose → HMR2 → HaMeR → wrist fusion → SMPL-H → sdc render,
              :556-839)
  get_bk_recover (ProPainter background inpaint, :841-877)
  get_occ    (keyframe occluder discovery + SAM2 tracking, :879-934)
with graceful-degradation codes for missing/partial persons (:362-465) and
every stage persisted to disk (:940-1024) enabling stage-level resume.

This orchestrator keeps those semantics: models are injected (so the stage
logic tests without pretrained weights), stage outputs persist to the
template dir and reload on resume, and failures map to the same codes.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from mimo_tpu.decomp import occlusion as OCC
from mimo_tpu.ops.connected_components import clean_mask
from mimo_tpu.utils import video_io as VIO

# status codes (reference run.py:362-465, surfaced at :962-969)
CODE_OK = 0
CODE_NO_PERSON = 1
CODE_PERSON_TOO_SMALL = 2
CODE_HALF_BODY = 3


@dataclass
class DecompConfig:
    target_fps: int = 30
    max_frames: int = 150
    max_resolution: int = 720        # resize cap (run.py:953-957)
    mask_min_area: int = 256
    bk_short_side: int = 480         # ProPainter working size (run.py:848-851)
    occ: OCC.OcclusionConfig = field(default_factory=OCC.OcclusionConfig)


@dataclass
class DecompModels:
    """Injected model callables; any None disables its stage gracefully.

    - detect_person(frame) -> (bbox_xyxy, score) or None
    - segment_box(frame, bbox) -> bool mask
    - track_video(frames, seed_mask, seed_frame) -> (T, H, W) bool
    - estimate_pose(frame, bbox) -> (K, 3) keypoints   [full-body check]
    - estimate_pose_batch(frames, bboxes) -> (T, K, 3)  [batched clips]
    - estimate_motion(frames, masks, bboxes) -> (T, H, W, 3) uint8 sdc
    - inpaint(frames01, masks) -> (T, H, W, 3) float backgrounds
    - automask(frame) -> list of {"segmentation": ...}
    - depth(frame) -> (H, W) float
    """

    detect_person: Optional[Callable] = None
    segment_box: Optional[Callable] = None
    track_video: Optional[Callable] = None
    estimate_pose: Optional[Callable] = None
    estimate_pose_batch: Optional[Callable] = None
    estimate_motion: Optional[Callable] = None
    inpaint: Optional[Callable] = None
    automask: Optional[Callable] = None
    depth: Optional[Callable] = None


class VideoProcessor:
    def __init__(self, models: DecompModels,
                 cfg: DecompConfig = DecompConfig()):
        self.models = models
        self.cfg = cfg

    # -- stage 1: human tracking -------------------------------------------

    def get_first_mask(self, frame: np.ndarray):
        """(mask, code): detector + box-prompted segmentation + full-body
        check (reference get_first_mask, run.py:362-465)."""
        m = self.models
        if m.detect_person is None or m.segment_box is None:
            return None, CODE_NO_PERSON
        det = m.detect_person(frame)
        if det is None:
            return None, CODE_NO_PERSON
        bbox, score = det
        x0, y0, x1, y1 = bbox
        area_frac = (x1 - x0) * (y1 - y0) / (frame.shape[0] * frame.shape[1])
        if area_frac < 0.02:  # reference: area > 2% of the frame
            return None, CODE_PERSON_TOO_SMALL
        if m.estimate_pose is not None:
            kpts = m.estimate_pose(frame, np.asarray(bbox))
            body = kpts[:17]  # COCO body keypoints
            if (body[:, 2] > 0.3).sum() < 10:
                return None, CODE_HALF_BODY
        mask = m.segment_box(frame, np.asarray(bbox))
        mask = clean_mask(mask, min_area=self.cfg.mask_min_area)
        return mask, CODE_OK

    def get_human(self, frames: Sequence[np.ndarray]):
        """(masks (T, H, W) bool, code): first mask + SAM2 propagation
        (reference get_video_track, run.py:467-514)."""
        first, code = self.get_first_mask(frames[0])
        if code != CODE_OK:
            return None, code
        if self.models.track_video is None:
            return np.stack([first] * len(frames)), CODE_OK
        masks = self.models.track_video(list(frames), first, 0)
        masks = np.stack([clean_mask(m, self.cfg.mask_min_area)
                          for m in masks])
        return masks, CODE_OK

    # -- stage 2: bboxes ----------------------------------------------------

    @staticmethod
    def get_bbox(masks: np.ndarray) -> np.ndarray:
        """Per-frame xyxy bbox from masks (run.py:532-545); empty masks get
        the previous frame's box."""
        out = []
        prev = None
        for m in masks:
            ys, xs = np.nonzero(m)
            if len(xs) == 0:
                out.append(prev if prev is not None else [0, 0, 1, 1])
                continue
            prev = [int(xs.min()), int(ys.min()),
                    int(xs.max()) + 1, int(ys.max()) + 1]
            out.append(prev)
        return np.asarray(out, np.int64)

    # -- stage 3: motion / sdc ---------------------------------------------

    def get_motion(self, frames, masks, bboxes):
        if self.models.estimate_motion is None:
            return None
        return self.models.estimate_motion(frames, masks, bboxes)

    # -- stage 4: background recovery --------------------------------------

    def get_bk_recover(self, frames: Sequence[np.ndarray],
                       masks: np.ndarray, dilate: int = 4):
        """ProPainter background inpaint with mask dilation and OOM-backoff
        retry at 0.75x resolution steps (run.py:841-877 — mask_dilation=4,
        the while/try resize loop at :852-861)."""
        if self.models.inpaint is None:
            return None
        import cv2
        k = np.ones((dilate * 2 + 1, dilate * 2 + 1), np.uint8)
        dil = np.stack([cv2.dilate(m.astype(np.uint8), k) for m in masks])
        frames_np = np.stack(frames)
        H, W = frames_np.shape[1:3]

        ratio = 1.0
        while True:
            try:
                h = max(16, int(H * ratio) // 8 * 8)
                w = max(16, int(W * ratio) // 8 * 8)
                fr = np.stack([cv2.resize(f, (w, h)) for f in frames_np])
                mr = np.stack([cv2.resize(m, (w, h),
                                          interpolation=cv2.INTER_NEAREST)
                               for m in dil])
                out = self.models.inpaint(
                    fr.astype(np.float32) / 255.0,
                    mr[..., None].astype(np.float32))
                # quantize to uint8 ON DEVICE: the f32 composite is
                # ~200 MB for a 48f 720x480 clip; the u8 download is 4x
                # smaller through the ~10 MB/s tunnel. np.asarray is also
                # where a deferred RESOURCE_EXHAUSTED surfaces (async
                # runtime), so it stays inside the backoff try.
                import jax.numpy as jnp
                out = np.asarray(
                    (jnp.clip(jnp.asarray(out), 0.0, 1.0)
                     * 255.0).astype(jnp.uint8))
                break
            except Exception as e:
                if ("RESOURCE_EXHAUSTED" not in str(e)
                        and "out of memory" not in str(e).lower()) \
                        or ratio < 0.3:
                    raise
                ratio *= 0.75  # reference backoff factor
        if out.shape[1:3] != (H, W):
            out = np.stack([cv2.resize(f, (W, H)) for f in out])
        return out

    # -- stage 5: occlusion -------------------------------------------------

    def get_occ(self, frames, person_masks, sdc=None):
        m = self.models
        if None in (m.automask, m.depth, m.track_video):
            return None
        occ = OCC.extract_occlusion_video(
            frames, person_masks, sdc, m.automask, m.depth,
            lambda fr, seed, kf: m.track_video(list(fr), seed, kf),
            self.cfg.occ)
        if occ is None:
            return None
        return np.stack([OCC.refine_occ_mask(o) for o in occ])

    # -- full run with stage persistence -----------------------------------

    def run(self, vid_path: str, save_dir: str,
            resume: bool = True) -> Dict[str, Any]:
        cfg = self.cfg
        os.makedirs(save_dir, exist_ok=True)
        t_start = time.time()

        frames = VIO.load_video_fixed_fps(vid_path, cfg.target_fps)
        frames = frames[: cfg.max_frames]
        # resolution cap (run.py:953-957)
        h, w = frames[0].shape[:2]
        if max(h, w) > cfg.max_resolution:
            import cv2
            s = cfg.max_resolution / max(h, w)
            nh, nw = int(h * s) // 2 * 2, int(w * s) // 2 * 2
            frames = [cv2.resize(f, (nw, nh)) for f in frames]

        def stage_path(name):
            return os.path.join(save_dir, name)

        result: Dict[str, Any] = {"code": CODE_OK}

        VIO.save_video(frames, stage_path("vid.mp4"), cfg.target_fps)

        # human masks
        if resume and os.path.exists(stage_path("mask.mp4")):
            masks = np.stack([f[..., 0] > 127
                              for f in VIO.read_frames(stage_path("mask.mp4"))])
        else:
            masks, code = self.get_human(frames)
            if code != CODE_OK:
                result["code"] = code
                return result
            VIO.save_video([(m * 255).astype(np.uint8)[..., None]
                            .repeat(3, -1) for m in masks],
                           stage_path("mask.mp4"), cfg.target_fps)

        bboxes = self.get_bbox(masks)
        np.save(stage_path("bbox.npy"), bboxes)

        sdc = None
        if resume and os.path.exists(stage_path("sdc.mp4")):
            sdc = np.stack(VIO.read_frames(stage_path("sdc.mp4")))
        else:
            sdc = self.get_motion(frames, masks, bboxes)
            if sdc is not None:
                VIO.save_video(list(sdc), stage_path("sdc.mp4"),
                               cfg.target_fps)

        if not (resume and os.path.exists(stage_path("bk.mp4"))):
            bk = self.get_bk_recover(frames, masks)
            if bk is not None:
                VIO.save_video(list(bk), stage_path("bk.mp4"), cfg.target_fps)

        occ = self.get_occ(frames, masks, sdc)
        if occ is not None:
            VIO.save_video([(o * 255).astype(np.uint8)[..., None]
                            .repeat(3, -1) for o in occ],
                           stage_path("occ.mp4"), cfg.target_fps)

        config = {
            "fps": cfg.target_fps,
            "time_crop": {"start_idx": 0, "end_idx": len(frames)},
            "frame_crop": None,
            "layer_recover": True,
        }
        with open(stage_path("config.json"), "w") as f:
            json.dump(config, f)
        result["num_frames"] = len(frames)
        result["elapsed_s"] = time.time() - t_start
        return result
