"""Person detection producing (bbox, score).

The reference uses Detectron2 ViTDet cascade Mask-RCNN (video_decomp/
run.py:285-293,376-399; score > 0.95, area > 2% of the frame). SURVEY.md
§2d item 4: any detector producing boxes+scores satisfies the contract.

Two implementations:
- `PoseScoredDetector`: SAM automatic masks proposed as regions, scored by
  ViTPose keypoint confidence inside each region — self-contained with the
  models already in this repo.
- `box_nms`: standard IoU NMS for box sets (the mmcv-ops NMS equivalent
  the rebuild actually needs, SURVEY.md §2d item 2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import numpy as np


def box_nms(boxes: np.ndarray, scores: np.ndarray,
            iou_thresh: float = 0.5) -> List[int]:
    """Greedy NMS. boxes: (N, 4) xyxy. Returns kept indices sorted by
    descending score."""
    order = np.argsort(-scores)
    keep: List[int] = []
    for i in order:
        ok = True
        for j in keep:
            if _iou(boxes[i], boxes[j]) > iou_thresh:
                ok = False
                break
        if ok:
            keep.append(int(i))
    return keep


def _iou(a, b) -> float:
    x0 = max(a[0], b[0]); y0 = max(a[1], b[1])
    x1 = min(a[2], b[2]); y1 = min(a[3], b[3])
    inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


@dataclass
class PoseScoredDetector:
    """Propose person regions with SAM auto-masks, score with keypoint
    confidence (estimate_pose(frame, bbox) -> (K, 3))."""

    automask: Callable[[np.ndarray], List[dict]]
    estimate_pose: Callable[[np.ndarray, np.ndarray], np.ndarray]
    min_area_frac: float = 0.02
    min_kpt_conf: float = 0.3
    min_kpts: int = 8

    def __call__(self, frame: np.ndarray
                 ) -> Optional[Tuple[np.ndarray, float]]:
        h, w = frame.shape[:2]
        best = None
        for cand in self.automask(frame):
            seg = cand["segmentation"]
            area = seg.sum()
            if area < self.min_area_frac * h * w:
                continue
            ys, xs = np.nonzero(seg)
            bbox = np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                            np.float32)
            kpts = self.estimate_pose(frame, bbox)
            body = kpts[:17]
            n_conf = int((body[:, 2] > self.min_kpt_conf).sum())
            if n_conf < self.min_kpts:
                continue
            score = float(body[:, 2].mean())
            if best is None or score > best[1]:
                best = (bbox, score)
        return best
