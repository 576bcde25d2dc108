"""Decomposition orchestrator: stage logic + end-to-end template writing
with synthetic injected models (no pretrained weights needed)."""

import json
import os

import numpy as np
import pytest

from mimo_tpu.decomp import occlusion as OCC
from mimo_tpu.decomp import pipeline as DP
from mimo_tpu.utils import video_io as VIO


def _synthetic_video(path, T=6, H=64, W=80):
    frames = []
    for t in range(T):
        f = np.full((H, W, 3), 30, np.uint8)
        cx = 30 + 2 * t
        f[20:60, cx - 8:cx + 8] = [200, 150, 120]   # "person"
        f[45:64, 0:20] = [90, 200, 90]              # static fg object
        frames.append(f)
    VIO.save_video(frames, path, fps=30)
    return frames


def _person_mask(frame):
    return (frame[..., 0] > 150) & (frame[..., 1] > 100) & (frame[..., 1] < 180)


def _models():
    def detect(frame):
        m = _person_mask(frame)
        ys, xs = np.nonzero(m)
        if len(xs) == 0:
            return None
        return (np.array([xs.min(), ys.min(), xs.max(), ys.max()]), 0.99)

    def segment(frame, bbox):
        return _person_mask(frame)

    def track(frames, seed, kf):
        # toy tracker: re-threshold using the seed's mean color per frame
        ref = frames[kf][seed].mean(axis=0)
        out = []
        for f in frames:
            d = np.linalg.norm(f.astype(np.float32) - ref, axis=-1)
            out.append(d < 60)
        return np.stack(out)

    def pose(frame, bbox):
        k = np.zeros((133, 3))
        k[:17, 2] = 0.9
        return k

    def motion(frames, masks, bboxes):
        return np.stack([(m[..., None] * np.array([128, 200, 90]))
                         .astype(np.uint8) for m in masks])

    def inpaint(frames01, masks):
        out = frames01.copy()
        bg = np.array([30, 30, 30], np.float32) / 255.0
        out = out * (1 - masks) + bg * masks
        return out

    def automask(frame):
        segs = []
        obj = (frame[..., 1] > 180) & (frame[..., 0] < 120)
        if obj.sum():
            segs.append({"segmentation": obj, "predicted_iou": 0.95,
                         "area": int(obj.sum())})
        pm = _person_mask(frame)
        segs.append({"segmentation": pm, "predicted_iou": 0.9,
                     "area": int(pm.sum())})
        return segs

    def depth(frame):
        d = np.zeros(frame.shape[:2], np.float32)
        d[_person_mask(frame)] = 0.5
        obj = (frame[..., 1] > 180) & (frame[..., 0] < 120)
        d[obj] = 0.9  # object closer than person
        return d

    return DP.DecompModels(detect_person=detect, segment_box=segment,
                           track_video=track, estimate_pose=pose,
                           estimate_motion=motion, inpaint=inpaint,
                           automask=automask, depth=depth)


def test_get_bbox_from_masks():
    masks = np.zeros((2, 10, 12), bool)
    masks[0, 2:5, 3:7] = True
    bb = DP.VideoProcessor.get_bbox(masks)
    assert list(bb[0]) == [3, 2, 7, 5]
    assert list(bb[1]) == [3, 2, 7, 5]  # empty mask reuses previous


def test_no_person_code(tmp_path):
    models = _models()
    models.detect_person = lambda f: None
    vp = DP.VideoProcessor(models)
    mask, code = vp.get_first_mask(np.zeros((32, 32, 3), np.uint8))
    assert code == DP.CODE_NO_PERSON


def test_half_body_code():
    models = _models()
    def pose_half(frame, bbox):
        k = np.zeros((133, 3))
        k[:5, 2] = 0.9  # only 5 confident body kpts
        return k
    models.estimate_pose = pose_half
    vp = DP.VideoProcessor(models)
    frame = np.full((64, 80, 3), 30, np.uint8)
    frame[5:60, 20:60] = [200, 150, 120]
    mask, code = vp.get_first_mask(frame)
    assert code == DP.CODE_HALF_BODY


# ---- exact get_obscure_obj port (demo_occ.py:574-662) ---------------------
# Hand-built 64x80 scene: visible person rows 10-50 x cols 30-50 (area 800),
# SDC render rows 10-60 x cols 30-50 (the full body, including legs hidden
# behind occluders), background depth 50, person depth 100, occluders 200.

_H, _W = 64, 80


def _occ_scene():
    person = np.zeros((_H, _W), bool)
    person[10:50, 30:50] = True
    sdc = np.zeros((_H, _W), np.uint8)
    sdc[10:60, 30:50] = 1
    depth = np.full((_H, _W), 50, np.float64)
    depth[person] = 100
    return person, sdc, depth


def _cand(mask, depth):
    depth[mask & ~(depth == 100)] = 200       # candidate is in front
    return {"segmentation": mask, "area": int(mask.sum())}


def test_avg_depth_value_denominator():
    """Denominator is the count of positive masked-depth pixels, not the
    mask area (demo_occ.py:527-535)."""
    depth = np.array([[0, 10], [20, 30]], np.float64)
    mask = np.array([[1, 1], [1, 0]], np.uint8)
    # masked = [0,10,20]; positives = 2 -> (0+10+20)/2 = 15
    assert OCC.avg_depth_value(depth, mask) == 15.0


def test_occ_depth_gate():
    """A candidate behind the person (depth below the person's average)
    fails the mask_obscure overlap fraction."""
    person, sdc, depth = _occ_scene()
    front = np.zeros((_H, _W), bool); front[44:60, 28:52] = True
    behind = np.zeros((_H, _W), bool); behind[10:44, 4:28] = True
    cands = [_cand(front, depth), {"segmentation": behind,
                                   "area": int(behind.sum())}]  # stays at 50
    kept = OCC.find_occluders_in_frame(cands, depth, person, sdc)
    assert len(kept) == 1
    assert not kept[0][20, 10]                # the behind blob was dropped


def test_occ_normal_branch_sdc_100():
    """Normal-size candidate: kept iff >= 100 px of its in-front region
    overlap the SDC render (demo_occ.py:645,648)."""
    person, sdc, depth = _occ_scene()
    # rows 50-60 x cols 30-50 of the occluder lie on the sdc legs: 200 px
    occ = np.zeros((_H, _W), bool); occ[44:60, 28:52] = True
    kept = OCC.find_occluders_in_frame([_cand(occ, depth)], person_mask=person,
                                       sdc_mask=sdc, depth=depth)
    assert len(kept) == 1

    # same-size candidate that never touches the sdc render: dropped
    person, sdc, depth = _occ_scene()
    away = np.zeros((_H, _W), bool); away[44:60, 0:24] = True
    kept = OCC.find_occluders_in_frame([_cand(away, depth)], depth, person,
                                       sdc)
    assert kept == []


def test_occ_large_mask_branch_sdc_600():
    """A candidate LARGER than the person needs >= 600 px of sdc overlap
    (demo_occ.py:642-643) — the same geometry below passes at normal size
    (150 px >= 100) but fails when grown past the person's area."""
    person, sdc, depth = _occ_scene()
    small = np.zeros((_H, _W), bool); small[35:60, 22:45] = True  # area 575
    kept = OCC.find_occluders_in_frame([_cand(small, depth)], depth, person,
                                       sdc)
    assert len(kept) == 1                     # sdc overlap 150 >= 100

    person, sdc, depth = _occ_scene()
    large = np.zeros((_H, _W), bool); large[10:60, 10:45] = True  # area 1750
    kept = OCC.find_occluders_in_frame([_cand(large, depth)], depth, person,
                                       sdc)
    assert kept == []                         # 150 < 600 for a large mask


def test_occ_ground_branch():
    """A full-width bottom band is a ground layer (bottom-10-rows coverage
    >= 90%, demo_occ.py:608-612): its sdc threshold drops to num_sdc*0.1
    even though its area exceeds the person's."""
    person, sdc, depth = _occ_scene()        # num_sdc = 1000 -> thr 100
    ground = np.zeros((_H, _W), bool); ground[48:64, :] = True   # area 1280
    kept = OCC.find_occluders_in_frame([_cand(ground, depth)], depth, person,
                                       sdc)
    assert len(kept) == 1                    # sdc overlap 200 >= 100

    # same band but only 70/80 cols: not ground -> large-mask thr 600
    person, sdc, depth = _occ_scene()
    partial = np.zeros((_H, _W), bool); partial[48:64, 0:70] = True
    kept = OCC.find_occluders_in_frame([_cand(partial, depth)], depth,
                                       person, sdc)
    assert kept == []                        # 200 < 600


def test_occ_person_mask_rejected():
    """judge_obj_valid drops the person's own auto-mask (inter > 80% of
    the person's area, demo_occ.py:398)."""
    person, sdc, depth = _occ_scene()
    cand = {"segmentation": person.copy(), "area": int(person.sum())}
    assert OCC.find_occluders_in_frame([cand], depth, person, sdc) == []


def test_pick_keyframes_component_ranked():
    """Frames where an occluder splits the person into more components
    rank first; picks are >= interval apart (tools/util.py:264-299)."""
    T = 50
    masks = []
    for t in range(T):
        m = np.zeros((_H, _W), np.uint8)
        m[10:50, 30:50] = 1
        if t in (7, 8, 30):                  # occluder splits the person
            m[25:32, :] = 0
        masks.append(m)
    cfg = OCC.OcclusionConfig(num_keyframes=2, keyframe_interval=20)
    picked = OCC.pick_keyframes(masks, cfg)
    assert len(picked) == 2
    assert any(p in (7, 8) for p in picked) and 30 in picked


def test_full_run_writes_template(tmp_path):
    vid = str(tmp_path / "in.mp4")
    _synthetic_video(vid)
    out = str(tmp_path / "tpl")
    vp = DP.VideoProcessor(_models())
    res = vp.run(vid, out)
    assert res["code"] == DP.CODE_OK
    for name in ("vid.mp4", "mask.mp4", "sdc.mp4", "bk.mp4", "bbox.npy",
                 "config.json"):
        assert os.path.exists(os.path.join(out, name)), name
    cfgd = json.load(open(os.path.join(out, "config.json")))
    assert set(cfgd) >= {"fps", "time_crop", "frame_crop", "layer_recover"}
    # the written template loads through the synthesis entry path
    from mimo_tpu.entry.template import load_template
    tpl = load_template(out)
    assert tpl.num_frames == res["num_frames"]
    assert tpl.bk is not None

    # resume path: rerun reuses stage outputs without error
    res2 = vp.run(vid, out, resume=True)
    assert res2["code"] == DP.CODE_OK
