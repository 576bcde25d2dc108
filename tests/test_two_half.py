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


# End-to-end two-half output golden (VERDICT r4 #7): per-frame mean/std of
# the tiny decomp→edit composite, recorded round 5 on CPU fp32. Unlike the
# per-block UNet goldens this pins the FULL cross-half path — template
# contract, occ compositing, feathering — so a cross-round regression
# anywhere in decomp→template→edit trips mechanically. Regenerate (only
# for INTENDED semantic changes, say why in the commit message) with:
#   cd tests && python - <<'PY'
#   import os; os.environ['JAX_PLATFORMS']='cpu'; import conftest
#   import numpy as np, jax.numpy as jnp, tempfile, sys
#   sys.path[:0] = ['/root/repo/tests', '/root/repo']
#   from mimo_tpu import config as C
#   from mimo_tpu.decomp import pipeline as DP
#   from mimo_tpu.entry import edit as ED
#   from mimo_tpu.entry.runner import Runner, init_random_params
#   from test_decomp_pipeline import _models, _synthetic_video
#   d = tempfile.mkdtemp(); vid = f"{d}/in.mp4"; _synthetic_video(vid)
#   DP.VideoProcessor(_models()).run(vid, f"{d}/tpl")
#   cfg = C.tiny_mimo_config()
#   runner = Runner(cfg=cfg, params=init_random_params(cfg, dtype=jnp.float32),
#                   dtype=jnp.float32)
#   ref = np.full((80,60,3),255,np.uint8); ref[16:70,18:42]=[30,60,160]
#   fr = ED.edit(runner, ref, f"{d}/tpl", width=32, height=32, steps=2,
#                cfg_scale=3.5, seed=0)
#   v = np.stack(fr).astype(np.float32)/255.0
#   print(repr(v.mean(axis=(1,2,3)))); print(repr(v.std(axis=(1,2,3))))
#   PY
TWO_HALF_GOLDEN_MEAN = np.array(
    [0.29115784, 0.28658244, 0.28509936, 0.29031864, 0.2846423,
     0.2918814], np.float32)
TWO_HALF_GOLDEN_STD = np.array(
    [0.23043956, 0.23062304, 0.22629301, 0.23632118, 0.2262393,
     0.23636626], np.float32)


def test_two_half_output_matches_recorded_golden(tiny_runner, tmp_path):
    vid = str(tmp_path / "in.mp4")
    _synthetic_video(vid)
    tpl_dir = str(tmp_path / "tpl")
    res = DP.VideoProcessor(_models()).run(vid, tpl_dir)
    assert res["code"] == DP.CODE_OK

    ref = np.full((80, 60, 3), 255, np.uint8)
    ref[16:70, 18:42] = [30, 60, 160]
    frames = ED.edit(tiny_runner, ref, tpl_dir, width=32, height=32,
                     steps=2, cfg_scale=3.5, seed=0)
    v = np.stack(frames).astype(np.float32) / 255.0
    m = v.mean(axis=(1, 2, 3))
    s = v.std(axis=(1, 2, 3))
    # 2e-4: the recorded values are fp32 CPU; uint8 quantization means a
    # one-level shift of every pixel would move the mean by 3.9e-3 (20x)
    np.testing.assert_allclose(m, TWO_HALF_GOLDEN_MEAN, atol=2e-4)
    np.testing.assert_allclose(s, TWO_HALF_GOLDEN_STD, atol=2e-4)
