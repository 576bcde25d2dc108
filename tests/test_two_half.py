"""Two-half integration: the decomposition pipeline writes a template dir
and the SYNTHESIS entry consumes it end to end (VERDICT r3 #4).

This pins the template contract (`config.json` keys, mp4 layout) between
`mimo_tpu/decomp/pipeline.py` (reference: video_decomp/run.py:1027-1034)
and `mimo_tpu/entry/edit.py` (reference: run_edit.py:132-151): a decomp
video -> template -> edit generate -> finite uint8 output frames.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mimo_tpu import config as C
from mimo_tpu.decomp import pipeline as DP
from mimo_tpu.entry import edit as ED
from mimo_tpu.entry.runner import Runner, init_random_params
from mimo_tpu.utils import video_io as VIO

from test_decomp_pipeline import _models, _synthetic_video


@pytest.fixture(scope="module")
def tiny_runner():
    cfg = C.tiny_mimo_config()
    params = init_random_params(cfg, dtype=jnp.float32)
    return Runner(cfg=cfg, params=params, dtype=jnp.float32)


def test_decomp_template_drives_edit(tiny_runner, tmp_path):
    # -- half 1: decompose a synthetic video into a template dir ---------
    vid = str(tmp_path / "in.mp4")
    _synthetic_video(vid)
    tpl_dir = str(tmp_path / "tpl")
    res = DP.VideoProcessor(_models()).run(vid, tpl_dir)
    assert res["code"] == DP.CODE_OK

    # -- half 2: the synthesis edit entry consumes that exact template ---
    ref = np.full((80, 60, 3), 255, np.uint8)
    ref[16:70, 18:42] = [30, 60, 160]
    frames = ED.edit(tiny_runner, ref, tpl_dir, width=32, height=32,
                     steps=2, cfg_scale=3.5, seed=0)

    # every decomposed frame comes back composited, finite, uint8
    assert len(frames) == res["num_frames"]
    first = VIO.read_frames(vid)[0]
    for f in frames:
        assert f.dtype == np.uint8
        assert f.shape == first.shape
        assert np.isfinite(f.astype(np.float32)).all()

    # the config the decomp wrote is what edit consumed (keys present and
    # time_crop honored by the frame count)
    cfgd = json.load(open(os.path.join(tpl_dir, "config.json")))
    tc = cfgd["time_crop"]
    assert tc["end_idx"] - tc["start_idx"] >= res["num_frames"]
