"""Video IO: mp4 roundtrip, fps resampling, random-access reader."""

import numpy as np

from mimo_tpu.utils import video_io as VIO


def _write_test_video(path, n=12, fps=30):
    frames = [np.full((32, 48, 3), i * 20 % 255, np.uint8) for i in range(n)]
    VIO.save_video(frames, str(path), fps=fps)
    return frames


def test_roundtrip(tmp_path):
    p = tmp_path / "v.mp4"
    frames = _write_test_video(p)
    back = VIO.read_frames(str(p))
    assert len(back) == len(frames)
    assert back[0].shape == (32, 48, 3)
    # mp4 is lossy; frame means should still track
    for a, b in zip(frames, back):
        assert abs(float(a.mean()) - float(b.mean())) < 12


def test_fixed_fps_downsample(tmp_path):
    p = tmp_path / "v.mp4"
    _write_test_video(p, n=12, fps=30)
    half = VIO.load_video_fixed_fps(str(p), target_fps=15)
    assert len(half) == 6


def test_get_fps(tmp_path):
    p = tmp_path / "v.mp4"
    _write_test_video(p, fps=30)
    assert abs(VIO.get_fps(str(p)) - 30) < 1


def test_video_reader_random_access(tmp_path):
    p = tmp_path / "v.mp4"
    frames = _write_test_video(p)
    with VIO.VideoReader(str(p)) as r:
        assert len(r) == 12
        assert r.fps == 30
        f5 = r.get_frame(5)
        assert abs(float(f5.mean()) - float(frames[5].mean())) < 12
        clip = r.sample_clip(4)
        assert len(clip) == 4


def test_float_frames_saved(tmp_path):
    p = tmp_path / "f.mp4"
    VIO.save_video([np.full((16, 16, 3), 0.5)] * 3, str(p), fps=10)
    back = VIO.read_frames(str(p))
    assert abs(float(back[0].mean()) - 127.5) < 8
