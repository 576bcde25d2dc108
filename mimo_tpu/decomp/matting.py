"""Reference-image human matting.

The reference drives a TF1 frozen graph (assets/matting_human.pb via
tools/human_segmenter.py:14-53) whose architecture is unpublished
(SURVEY.md §2d item 5). The designated TPU-native replacement is SAM-based
matting (box/point prompt → mask → feathered alpha); a border-statistics
heuristic serves as the zero-weight fallback. Both return (rgba, person
flag) matching human_segmenter.run's contract (RGBA output + if_person).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from mimo_tpu.utils import frames as FU


def heuristic_matting(img: np.ndarray,
                      bg_dist_thresh: float = 40.0) -> Tuple[np.ndarray, bool]:
    """Foreground = pixels far from the border-estimated background color.
    Returns (rgba uint8, person_found)."""
    border = np.concatenate([
        img[0].reshape(-1, 3), img[-1].reshape(-1, 3),
        img[:, 0].reshape(-1, 3), img[:, -1].reshape(-1, 3)], axis=0)
    bg = np.median(border.astype(np.float32), axis=0)
    dist = np.linalg.norm(img.astype(np.float32) - bg, axis=-1)
    mask = (dist > bg_dist_thresh).astype(np.uint8) * 255
    mask = FU.clean_mask(mask)
    alpha = _feather(mask)
    rgba = np.dstack([img, alpha])
    found = mask.mean() > 2.0
    return rgba, bool(found)


def sam_matting(img: np.ndarray, predictor,
                box: Optional[np.ndarray] = None) -> Tuple[np.ndarray, bool]:
    """SAM-based matting: prompt with the given box (or the central region)
    and feather the best mask. `predictor` is decomp.sam.SamPredictor."""
    h, w = img.shape[:2]
    if box is None:
        box = np.array([w * 0.1, h * 0.05, w * 0.9, h * 0.98])
    predictor.set_image(img)
    masks, iou = predictor.predict(box=box)
    best = int(np.argmax(iou[1:])) + 1 if len(iou) > 1 else 0
    mask = masks[best].astype(np.uint8) * 255
    alpha = _feather(mask)
    rgba = np.dstack([img, alpha])
    return rgba, bool(mask.mean() > 2.0)


def _feather(mask255: np.ndarray, radius: int = 3) -> np.ndarray:
    try:
        import cv2
        k = 2 * radius + 1
        return cv2.GaussianBlur(mask255, (k, k), 0)
    except Exception:
        return mask255


def composite_on_white(rgba: np.ndarray) -> np.ndarray:
    """RGBA -> RGB over white (tools/human_segmenter.py run + the
    run_edit.py:164-170 prep)."""
    a = rgba[..., 3:4].astype(np.float32) / 255.0
    rgb = rgba[..., :3].astype(np.float32)
    out = rgb * a + 255.0 * (1 - a)
    return out.astype(np.uint8)
