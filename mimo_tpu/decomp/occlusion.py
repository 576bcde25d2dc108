"""Occlusion extraction: find objects in front of the person and build the
occ mask video.

Reference: video_decomp/demo_occ.py (882 LoC) + tools/util.py +
tools/auto_mask.py:
- keyframe choice: the ~5 frames whose cleaned person mask has the MOST
  connected components, spaced >= interval apart (get_occ_frame,
  tools/util.py:264-299),
- SAM auto-masks + NMS dedup (demo_occ.py:90-99, auto_mask.py:43-134),
- DepthAnythingV2 relative depth, min-max normalized to uint8 [0, 255],
  larger = closer (pred_depth, demo_occ.py:210-215),
- the occluder decision function get_obscure_obj (demo_occ.py:574-662):
  avg-depth replacement inside the person mask, mask_obscure overlap
  fraction, ground-layer detection, and ground/size-dependent
  sdc-intersection thresholds — ported EXACTLY (see
  find_occluders_in_frame),
- each kept mask tracked through the clip with SAM2 and OR-merged, with
  judge_obj_valid dedup against the accumulated mask
  (get_video_track, demo_occ.py:405-504).

Host-side numpy logic; the model calls (SAM automask, depth, SAM2
tracking) are injected as callables so the stage is testable without
weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class OcclusionConfig:
    """Thresholds, all defaulted to the reference's literals.

    - overlap_threshold: fraction of the candidate (outside the person)
      that must lie in the depth-obscure region (demo_occ.py:76,630).
    - ground_rows / ground_frac: a mask covering >= ground_frac of the
      bottom ground_rows rows is a ground layer (demo_occ.py:608-612).
    - sdc thresholds: minimum overlap (pixels) between the candidate's
      obscure intersection and the sdc person render — num_sdc * 0.1 for
      ground layers, 600 for masks larger than the person, 100 otherwise
      (demo_occ.py:640-652).
    - person_inter_frac / cand_inter_frac: judge_obj_valid's "this is the
      main object / already covered" rejection (demo_occ.py:384-401).
    """
    num_keyframes: int = 5
    keyframe_interval: int = 20
    overlap_threshold: float = 0.4
    ground_rows: int = 10
    ground_frac: float = 0.9
    sdc_frac_ground: float = 0.1
    sdc_thresh_large: int = 600
    sdc_thresh_normal: int = 100
    person_inter_frac: float = 0.8
    cand_inter_frac: float = 0.5


def clean_mask(mask: np.ndarray) -> np.ndarray:
    """Morphological close (5x5 rect) then open (2x2 rect) on a 0/1 or
    0/255 uint8 mask (tools/util.py:257-262)."""
    import cv2
    m = mask.astype(np.uint8)
    se1 = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    se2 = cv2.getStructuringElement(cv2.MORPH_RECT, (2, 2))
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, se1)
    m = cv2.morphologyEx(m, cv2.MORPH_OPEN, se2)
    return m


def extract_mask_sdc(img: np.ndarray) -> np.ndarray:
    """Person-present mask from a rendered SDC frame: gray value > 10
    (tools/util.py:248-255 — the >10 threshold removes codec noise)."""
    import cv2
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return (gray > 10).astype(np.uint8)


def avg_depth_value(depth: np.ndarray, mask: np.ndarray) -> float:
    """Mean depth over the mask, averaging only strictly-positive masked
    depth values (demo_occ.py:527-535 — the denominator is
    sum(depth*mask > 0), NOT the mask area)."""
    masked = depth * mask
    n = np.sum(masked > 0)
    if n == 0:
        return 0.0
    return float(np.sum(masked) / n)


def judge_obj_valid(obj_mask: np.ndarray, cur_mask: np.ndarray,
                    cfg: OcclusionConfig = OcclusionConfig()) -> bool:
    """False when obj_mask is (mostly) already covered: intersection with
    cur_mask exceeds 80% of obj_mask's area or 50% of cur_mask's area
    (demo_occ.py:384-401; used both to drop the person-sized auto mask and
    to dedup seeds across keyframes)."""
    inter = np.logical_and(obj_mask > 0, cur_mask > 0).sum()
    num_obj = np.sum(obj_mask > 0)
    num_cur = np.sum(cur_mask > 0)
    return not (inter > num_obj * cfg.person_inter_frac
                or inter > num_cur * cfg.cand_inter_frac)


def pick_keyframes(person_masks: Sequence[np.ndarray],
                   cfg: OcclusionConfig = OcclusionConfig()) -> List[int]:
    """The reference's get_occ_frame (tools/util.py:264-299): rank frames
    by the number of connected components of the cleaned person mask
    (more components = more likely an occluder splits the person), keep up
    to num_keyframes indices pairwise >= keyframe_interval apart, sorted.
    """
    import cv2
    n_comp = []
    for frame in person_masks:
        m = np.asarray(frame)
        if m.ndim == 3:
            m = m[..., 0]
        m = (m * 255) if m.max() <= 1 else m
        m = clean_mask(m.astype(np.uint8))
        num, _, _, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
        n_comp.append(num - 1)
    order = np.argsort(n_comp)[::-1]
    picked: List[int] = []
    for idx in order:
        if len(picked) >= cfg.num_keyframes:
            break
        if all(abs(int(idx) - v) >= cfg.keyframe_interval for v in picked):
            picked.append(int(idx))
    return sorted(picked) or [0]


def find_occluders_in_frame(
    candidates: Sequence[Dict], depth: np.ndarray, person_mask: np.ndarray,
    sdc_mask: np.ndarray, cfg: OcclusionConfig = OcclusionConfig(),
) -> List[np.ndarray]:
    """Exact port of get_obscure_obj (demo_occ.py:574-662).

    candidates: SAM automask dicts {"segmentation": bool HxW, "area": int};
    depth: (H, W) uint8-scale relative depth, larger = closer;
    person_mask: (H, W) 0/1; sdc_mask: (H, W) 0/1 cleaned SDC person mask.

    Decision per candidate, largest area first:
    1. judge_obj_valid vs the person mask (drops the person's own mask and
       near-person masks);
    2. ground-layer flag: bottom-10-rows coverage >= 90% (computed BEFORE
       morphological cleaning, as in the reference);
    3. clean_mask, then subtract the person region;
    4. depth gate: the candidate (outside the person) must overlap
       mask_obscure — pixels whose avg-depth-replaced depth exceeds the
       person's average (i.e. in front of the person) — by more than
       overlap_threshold x its own area;
    5. sdc gate: the obscure intersection must also overlap the sdc render
       by >= num_sdc*0.1 (ground) / 600 (mask larger than person) / 100 px.

    Note the reference computes a bbox window (mask_bbox) but does NOT
    apply it in get_obscure_obj (demo_occ.py:587-591 — the multiply is
    only in the older get_obscure_prompts), so no bbox argument here.
    """
    person = (np.asarray(person_mask) > 0).astype(np.uint8)
    avg = avg_depth_value(depth, person)
    new_depth = person * avg + (1 - person) * depth
    mask_obscure = (new_depth > avg).astype(np.uint8)

    num_sdc = int(np.sum(np.asarray(sdc_mask) > 0))
    num_person = int(np.sum(person > 0))
    inv_person = (1 - person).astype(np.uint8)
    sdc01 = (np.asarray(sdc_mask) > 0).astype(np.uint8)

    kept: List[np.ndarray] = []
    for ann in sorted(candidates, key=lambda a: a["area"], reverse=True):
        m = ann["segmentation"].astype(np.uint8)

        if not judge_obj_valid(person, m, cfg):
            continue

        # ground layer or not (on the RAW candidate mask)
        gr = cfg.ground_rows
        num_ground = int(np.sum(m[-gr:, :] > 0))
        is_ground = num_ground >= gr * m.shape[1] * cfg.ground_frac

        m = clean_mask(m)
        m = m * inv_person

        num_valid = int(np.sum(m > 0))
        intersect = m * mask_obscure
        if np.sum(intersect) < cfg.overlap_threshold * num_valid:
            continue

        intersect_sdc = intersect * sdc01
        if is_ground:
            sdc_thresh = int(num_sdc * cfg.sdc_frac_ground)
        elif int(np.sum(m > 0)) > num_person:
            sdc_thresh = cfg.sdc_thresh_large
        else:
            sdc_thresh = cfg.sdc_thresh_normal
        if np.sum(intersect_sdc > 0) < sdc_thresh:
            continue
        kept.append(m.astype(bool))
    return kept


def extract_occlusion_video(
    frames: Sequence[np.ndarray], person_masks: Sequence[np.ndarray],
    sdc_frames: Optional[Sequence[np.ndarray]],
    automask_fn: Callable[[np.ndarray], List[Dict]],
    depth_fn: Callable[[np.ndarray], np.ndarray],
    track_fn: Callable[[Sequence[np.ndarray], np.ndarray, int], np.ndarray],
    cfg: OcclusionConfig = OcclusionConfig(),
) -> Optional[np.ndarray]:
    """Full occ stage (run.py:879-934 + demo_occ.py:405-504): keyframes →
    automask candidates → get_obscure_obj filter → track each occluder
    through the clip and OR-merge, deduping seeds already covered by the
    accumulated mask (judge_obj_valid). Returns (T, H, W) bool or None
    when no occluders are found.

    sdc_frames: rendered SDC video (RGB frames) for the sdc gate; None
    falls back to the person masks (degraded mode — the sdc gate then
    measures overlap with the segmented person instead of the posed
    render; only used when the motion stage failed).

    track_fn(frames, seed_mask, seed_frame) -> (T, H, W) bool — typically
    sam2.track_object with points sampled from the seed mask.
    """
    T = len(frames)
    merged: Optional[np.ndarray] = None
    for kf in pick_keyframes(person_masks, cfg):
        cands = automask_fn(frames[kf])
        depth = depth_fn(frames[kf])
        if sdc_frames is not None:
            sdc_mask = clean_mask(extract_mask_sdc(sdc_frames[kf]))
        else:
            sdc_mask = clean_mask((np.asarray(person_masks[kf]) > 0)
                                  .astype(np.uint8))
        occluders = find_occluders_in_frame(cands, depth, person_masks[kf],
                                            sdc_mask, cfg)
        for seg in occluders:
            if merged is not None and not judge_obj_valid(
                    seg.astype(np.uint8), merged[kf].astype(np.uint8), cfg):
                continue                      # repeat obj, skip
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
    from mimo_tpu.ops.connected_components import clean_mask as cc_clean
    m = mask.astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, k)
    m = cv2.morphologyEx(m, cv2.MORPH_OPEN, k)
    return cc_clean(m.astype(bool), min_area=min_area)
