"""Frame-utility tests (crop/pad/ROI/feather semantics vs the documented
reference behavior)."""

import numpy as np

from mimo_tpu.utils import frames as FU


def _sdc_frame(h, w, y0, y1, x0, x1):
    f = np.zeros((h, w, 3), np.uint8)
    f[y0:y1, x0:x1] = 200
    return f


def test_pad_img_square_mod16():
    img = np.zeros((50, 30, 3), np.uint8)
    out, (top, bottom, left, right) = FU.pad_img(img, (255, 255, 255))
    assert out.shape[0] == out.shape[1]
    assert out.shape[0] % 16 == 0
    assert out.shape[0] >= 50
    assert top + bottom + 50 == out.shape[0]
    assert left + right + 30 == out.shape[1]
    # padding is white, content preserved
    assert (out[:top] == 255).all()
    assert (out[top:top + 50, left:left + 30] == 0).all()


def test_pad_img_already_mod16():
    img = np.zeros((64, 64, 3), np.uint8)
    out, pv = FU.pad_img(img)
    assert out.shape == (64, 64, 3)
    assert pv == (0, 0, 0, 0)


def test_extract_mask_sdc_threshold():
    img = np.zeros((10, 10, 3), np.uint8)
    img[2:5, 3:7] = 100
    img[8, 8] = 5  # below threshold 10 -> noise removed
    m = FU.extract_mask_sdc(img)
    assert (m[2:5, 3:7] == 255).all()
    assert m[8, 8] == 0


def test_crop_img_extends_5pct():
    img = np.arange(100 * 60 * 3, dtype=np.uint8).reshape(100, 60, 3)
    mask = np.zeros((100, 60), np.uint8)
    mask[20:80, 10:50] = 255  # h=60 -> 5% = 3
    out = FU.crop_img(img, mask)
    assert out.shape[0] == 60 + 6
    assert out.shape[1] == 40


def test_crop_human_common_bbox():
    frames = [_sdc_frame(64, 64, 10, 40, 10, 30),
              _sdc_frame(64, 64, 20, 50, 20, 40)]
    others = [np.full((64, 64, 3), 7, np.uint8) for _ in frames]
    pose_c, other_c, bbox = FU.crop_human(frames, others)
    assert len(pose_c) == 2
    x, x_max, y, y_max = bbox
    assert (x_max - x) % 2 == 0 and (y_max - y) % 2 == 0
    assert pose_c[0].shape == pose_c[1].shape == other_c[0].shape


def test_roi_clip_context_static_scene():
    """A static subject yields a single shot covering all frames."""
    frames = [_sdc_frame(64, 64, 10, 50, 10, 40) for _ in range(6)]
    vid = [f.copy() for f in frames]
    bk = [f.copy() for f in frames]
    pose_c, vid_c, bk_c, bbox_clip, ctx_list, bbox_list = \
        FU.crop_human_clip_auto_context(frames, vid, bk, overlay=2)
    assert len(ctx_list) == 1
    assert ctx_list[0] == list(range(6))
    assert len(pose_c) == 6
    assert all(b is not None for b in bbox_clip)


def test_roi_clip_context_shot_split():
    """A large subject jump forces a new shot with overlap frames."""
    frames = ([_sdc_frame(128, 128, 4, 60, 4, 40) for _ in range(5)]
              + [_sdc_frame(128, 128, 70, 124, 80, 124) for _ in range(5)])
    vid = [f.copy() for f in frames]
    bk = [f.copy() for f in frames]
    pose_c, vid_c, bk_c, bbox_clip, ctx_list, bbox_list = \
        FU.crop_human_clip_auto_context(frames, vid, bk, overlay=2)
    assert len(ctx_list) >= 2
    # second shot starts `overlay` frames before the split
    assert ctx_list[1][0] == ctx_list[0][-1] + 1 - 2
    assert len(pose_c) == sum(len(c) for c in ctx_list)


def test_feather_mask_modes():
    m = FU.make_feather_mask((40, 40), "inner", feather=8)
    assert m[0, 20] == 0.0 and m[-1, 20] == 0.0
    assert m[20, 0] == 0.0 and m[20, -1] == 0.0
    assert m[20, 20] == 1.0

    m = FU.make_feather_mask((40, 40), "up_down_left_right", feather=8)
    assert (m == 1).all()

    m = FU.make_feather_mask((40, 40), "left", feather=8)
    assert m[20, 0] == 1.0      # touches left border: opaque
    assert m[20, -1] == 0.0     # feathers at right
    assert m[0, 20] == 0.0      # feathers top/bottom


def test_get_mask_mode():
    # frame 100x100
    assert FU.get_mask_mode((10, 50, 10, 50), (100, 100)) == "inner"
    assert FU.get_mask_mode((0, 50, 10, 50), (100, 100)) == "left"
    assert FU.get_mask_mode((0, 100, 0, 100), (100, 100)) == \
        "up_down_left_right"
    assert FU.get_mask_mode((10, 100, 0, 50), (100, 100)) == "right_up"


def test_init_bk_white():
    frames = FU.init_bk(3, 8, 9)
    assert len(frames) == 3
    assert frames[0].shape == (8, 9, 3)
    assert (frames[0] == 255).all()


def test_pose_adjust_shapes():
    img = np.full((200, 100, 3), 128, np.uint8)
    out = FU.pose_adjust(img, width=64, height=96)
    assert out.shape == (96, 64, 3)
