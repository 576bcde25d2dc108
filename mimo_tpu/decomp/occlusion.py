"""Occlusion extraction: find objects in front of the person and build the
occ mask video.

Reference: video_decomp/demo_occ.py (882 LoC) + tools/auto_mask.py (595):
- keyframe choice (~5 frames, interval 20: tools/util.py:264),
- SAM auto-masks + NMS dedup (demo_occ.py:90-99, auto_mask.py:43-134),
- DepthAnythingV2 relative depth (demo_occ.py:210-215),
- candidate kept if in front of the person's mean depth AND overlapping the
  sdc person mask, with size/ground-dependent thresholds
  (get_obscure_obj, demo_occ.py:574-662),
- each kept mask tracked fwd+bwd with SAM2 and OR-merged
  (demo_occ.py:405-504).

Host-side numpy logic; the model calls (SAM automask, depth, SAM2 tracking)
are injected as callables so the stage is testable without weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class OcclusionConfig:
    num_keyframes: int = 5
    keyframe_interval: int = 20
    min_overlap_px: int = 50        # occluder must touch the person region
    min_area: int = 400
    max_area_frac: float = 0.5      # drop near-full-frame masks (background)
    depth_margin: float = 0.0       # occluder depth must exceed person+margin
    person_iou_max: float = 0.7     # drop masks that ARE the person


def pick_keyframes(num_frames: int, cfg: OcclusionConfig) -> List[int]:
    """~num_keyframes indices spread by interval (tools/util.py:264)."""
    step = max(1, min(cfg.keyframe_interval,
                      num_frames // max(1, cfg.num_keyframes)))
    idx = list(range(0, num_frames, step))[: cfg.num_keyframes]
    return idx or [0]


def find_occluders_in_frame(
    candidates: Sequence[Dict], depth: np.ndarray, person_mask: np.ndarray,
    cfg: OcclusionConfig,
) -> List[np.ndarray]:
    """Filter auto-mask candidates to occluders of the person.

    candidates: list of {"segmentation": bool HxW, ...} (SAM automask);
    depth: (H, W) relative depth, larger = closer (DepthAnythingV2);
    person_mask: bool (H, W). Implements the demo_occ.py:574-662 decision:
    overlap with the person region + mean depth in front of the person's.
    """
    person = person_mask.astype(bool)
    if not person.any():
        return []
    person_depth = float(depth[person].mean())
    frame_area = person.size
    kept = []
    for cand in candidates:
        seg = cand["segmentation"].astype(bool)
        area = int(seg.sum())
        if area < cfg.min_area or area > cfg.max_area_frac * frame_area:
            continue
        inter = np.logical_and(seg, person).sum()
        if inter < cfg.min_overlap_px:
            continue
        union = np.logical_or(seg, person).sum()
        if union and inter / union > cfg.person_iou_max:
            continue  # this mask IS (mostly) the person
        seg_outside = seg & ~person
        if not seg_outside.any():
            continue
        cand_depth = float(depth[seg_outside].mean())
        if cand_depth > person_depth + cfg.depth_margin:  # closer to camera
            kept.append(seg)
    return kept


def extract_occlusion_video(
    frames: Sequence[np.ndarray], person_masks: Sequence[np.ndarray],
    automask_fn: Callable[[np.ndarray], List[Dict]],
    depth_fn: Callable[[np.ndarray], np.ndarray],
    track_fn: Callable[[Sequence[np.ndarray], np.ndarray, int], np.ndarray],
    cfg: OcclusionConfig = OcclusionConfig(),
) -> Optional[np.ndarray]:
    """Full occ stage: keyframes → candidates → depth filter → track each
    occluder through the clip (fwd+bwd, OR-merge). Returns (T, H, W) bool
    or None when no occluders found.

    track_fn(frames, seed_mask, seed_frame) -> (T, H, W) bool — typically
    sam2.track_object with points sampled from the seed mask.
    """
    T = len(frames)
    merged: Optional[np.ndarray] = None
    for kf in pick_keyframes(T, cfg):
        cands = automask_fn(frames[kf])
        depth = depth_fn(frames[kf])
        occluders = find_occluders_in_frame(cands, depth, person_masks[kf],
                                            cfg)
        for seg in occluders:
            track = track_fn(frames, seg, kf)
            merged = track if merged is None else (merged | track)
    return merged


def sample_mask_points(mask: np.ndarray, n: int = 5,
                       seed: int = 0) -> np.ndarray:
    """Sample prompt points inside a mask (reference
    sample_points_mask_unified, video_decomp/tools/util.py:83): the mask
    centroid plus uniformly drawn interior points."""
    ys, xs = np.nonzero(mask)
    assert len(xs) > 0
    pts = [[xs.mean(), ys.mean()]]
    rng = np.random.default_rng(seed)
    for i in rng.choice(len(xs), size=min(n - 1, len(xs)), replace=False):
        pts.append([xs[i], ys[i]])
    return np.asarray(pts, np.float32)


def refine_occ_mask(mask: np.ndarray, rgb: Optional[np.ndarray] = None,
                    min_area: int = 64) -> np.ndarray:
    """Per-frame occ mask refinement.

    The reference runs an opaque ONNX model (models/refine_mask.onnx,
    video_decomp/run.py:39-48,1012-1025) whose architecture is unpublished
    (SURVEY.md §2d item 6); the self-contained equivalent is morphological
    smoothing + connected-component cleanup.
    """
    import cv2
    from mimo_tpu.ops.connected_components import clean_mask
    m = mask.astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, k)
    m = cv2.morphologyEx(m, cv2.MORPH_OPEN, k)
    return clean_mask(m.astype(bool), min_area=min_area)
