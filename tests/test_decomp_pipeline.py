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


def test_occlusion_filter_depth_ordering():
    H, W = 32, 32
    person = np.zeros((H, W), bool); person[8:28, 10:22] = True
    front = np.zeros((H, W), bool); front[20:32, 8:16] = True   # overlaps
    behind = np.zeros((H, W), bool); behind[20:32, 16:24] = True
    depth = np.zeros((H, W), np.float32)
    depth[person] = 0.5
    depth[front & ~person] = 0.9
    depth[behind & ~person] = 0.1
    cands = [{"segmentation": front}, {"segmentation": behind}]
    cfg = OCC.OcclusionConfig(min_area=10, min_overlap_px=5)
    kept = OCC.find_occluders_in_frame(cands, depth, person, cfg)
    assert len(kept) == 1
    assert (kept[0] == front).all()


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
