"""Behavior-contract tests for the documented substitutes.

Three reference components are opaque/unpublishable (SURVEY.md §2d):
the TF matting graph (tools/human_segmenter.py), the Detectron2 ViTDet
detector (video_decomp/run.py:285-293), and refine_mask.onnx
(run.py:1012-1025). The substitutes are graded by behavior contract, not
weights — these tests pin the contracts quantitatively (mask-IoU against
synthetic ground truth, rejection behavior) so a regression in a
substitute's quality fails CI rather than silently degrading templates.
"""

import numpy as np
import pytest

from mimo_tpu.decomp import detector as D
from mimo_tpu.decomp import matting as M
from mimo_tpu.decomp.occlusion import refine_occ_mask


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(bool)
    b = b.astype(bool)
    u = np.logical_or(a, b).sum()
    return float(np.logical_and(a, b).sum() / u) if u else 1.0


def _synthetic_person(h=160, w=120, noise=8.0, seed=0):
    """A person-ish silhouette (head disc + torso ellipse + legs) in
    distinct clothing colors over a noisy near-uniform studio background.
    Returns (rgb uint8, gt bool mask)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    head = ((yy - 30) ** 2 + (xx - 60) ** 2) < 14 ** 2
    torso = (((yy - 75) / 35) ** 2 + ((xx - 60) / 22) ** 2) < 1.0
    legl = (np.abs(xx - 50) < 7) & (yy > 100) & (yy < 150)
    legr = (np.abs(xx - 70) < 7) & (yy > 100) & (yy < 150)
    gt = head | torso | legl | legr
    img = np.full((h, w, 3), 235.0, np.float32)
    img[head] = (188, 152, 126)          # skin
    img[torso] = (60, 90, 150)           # shirt
    img[legl | legr] = (40, 40, 55)      # trousers
    img += rng.normal(0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), gt


def test_heuristic_matting_iou_contract():
    img, gt = _synthetic_person()
    rgba, found = M.heuristic_matting(img)
    assert found
    alpha = rgba[..., 3] > 127
    assert _iou(alpha, gt) > 0.85


def test_heuristic_matting_empty_frame_flag():
    rng = np.random.default_rng(1)
    img = np.clip(np.full((120, 100, 3), 228.0)
                  + rng.normal(0, 6.0, (120, 100, 3)), 0, 255).astype(np.uint8)
    _, found = M.heuristic_matting(img)
    assert not found


def test_sam_matting_picks_best_mask_and_feathers():
    img, gt = _synthetic_person()

    class StubPredictor:
        """predictor contract: set_image + predict(box) -> (masks, iou)."""

        def set_image(self, image):
            self.image = image

        def predict(self, box=None):
            bad = np.zeros_like(gt)
            bad[:20, :20] = True
            # index 0 is SAM's ambiguous whole-image guess; the matting
            # policy must prefer the best of the multimask outputs (1:)
            return (np.stack([np.ones_like(gt), bad, gt]),
                    np.array([0.99, 0.40, 0.93]))

    rgba, found = M.sam_matting(img, StubPredictor())
    assert found
    alpha = rgba[..., 3] > 127
    assert _iou(alpha, gt) > 0.9
    # feathering: the alpha edge must be soft (intermediate values exist)
    assert ((rgba[..., 3] > 20) & (rgba[..., 3] < 235)).sum() > 50


def test_heuristic_vs_sam_matting_agreement():
    """The zero-weight fallback must substantially agree with the primary
    SAM path on an easy figure — the contract that makes the fallback an
    acceptable stand-in when no SAM weights are present."""
    img, gt = _synthetic_person()
    rgba_h, _ = M.heuristic_matting(img)

    class GTPredictor:
        def set_image(self, image):
            pass

        def predict(self, box=None):
            return np.stack([gt, gt]), np.array([0.9, 0.95])

    rgba_s, _ = M.sam_matting(img, GTPredictor())
    assert _iou(rgba_h[..., 3] > 127, rgba_s[..., 3] > 127) > 0.8


def test_refine_occ_mask_denoising_contract():
    """Substitute for refine_mask.onnx: specks below min_area are removed,
    pinholes are closed, and the clean blob itself survives unharmed."""
    rng = np.random.default_rng(2)
    h, w = 120, 150
    yy, xx = np.mgrid[0:h, 0:w]
    blob = (((yy - 60) / 30) ** 2 + ((xx - 75) / 45) ** 2) < 1.0
    noisy = blob.copy()
    # pinholes inside the blob
    holes = rng.random((h, w)) < 0.02
    noisy[blob & holes] = False
    # isolated specks outside (well below min_area=64)
    for _ in range(12):
        y = int(rng.integers(0, h - 3))
        x = int(rng.integers(0, w - 3))
        if not blob[max(0, y - 6):y + 9, max(0, x - 6):x + 9].any():
            noisy[y:y + 2, x:x + 2] = True

    refined = refine_occ_mask(noisy, min_area=64)
    assert _iou(refined, blob) > 0.95
    # every speck gone: nothing survives far from the blob
    assert not refined[~_dilate(blob, 5)].any()


def _dilate(mask: np.ndarray, r: int) -> np.ndarray:
    import cv2
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r + 1, 2 * r + 1))
    return cv2.dilate(mask.astype(np.uint8), k).astype(bool)


def test_detector_rejections():
    """Contract per SURVEY §2d item 4: boxes+scores, small regions and
    low-confidence poses rejected (reference thresholds: score>0.95,
    area > 2% — ours: min_area_frac / min_kpt_conf / min_kpts)."""
    person = np.zeros((40, 40), bool)
    person[5:35, 10:30] = True

    def automask(frame):
        return [{"segmentation": person}]

    def low_conf_pose(frame, bbox):
        k = np.zeros((133, 3))
        k[:17, 2] = 0.1                 # all below min_kpt_conf
        return k

    det = D.PoseScoredDetector(automask=automask,
                               estimate_pose=low_conf_pose)
    assert det(np.zeros((40, 40, 3), np.uint8)) is None

    def good_pose(frame, bbox):
        k = np.zeros((133, 3))
        k[:17, 2] = 0.9
        return k

    # area gate: a high-confidence but tiny region must be rejected
    tiny = np.zeros((40, 40), bool)
    tiny[0:4, 0:4] = True
    det2 = D.PoseScoredDetector(automask=lambda f: [{"segmentation": tiny}],
                                estimate_pose=good_pose)
    assert det2(np.zeros((40, 40, 3), np.uint8)) is None

    # and the full-size one accepted with its score
    det3 = D.PoseScoredDetector(automask=automask, estimate_pose=good_pose)
    out = det3(np.zeros((40, 40, 3), np.uint8))
    assert out is not None and out[1] == pytest.approx(0.9)
