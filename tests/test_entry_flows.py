"""End-to-end animate/edit flows through the Runner with tiny configs —
the CPU equivalent of the TPU CLI verification in .claude/skills/verify."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mimo_tpu import config as C
from mimo_tpu.entry.runner import Runner, init_random_params
from mimo_tpu.entry import animate as AN
from mimo_tpu.entry import edit as ED
from mimo_tpu.utils import video_io as VIO


@pytest.fixture(scope="module")
def tiny_runner():
    cfg = C.tiny_mimo_config()
    params = init_random_params(cfg, dtype=jnp.float32)
    return Runner(cfg=cfg, params=params, dtype=jnp.float32)


def _make_template(tmp_path, with_bk=False, with_occ=False, T=5, H=64, W=64):
    d = tmp_path / "tpl"
    d.mkdir(exist_ok=True)
    sdc = []
    for t in range(T):
        f = np.zeros((H, W, 3), np.uint8)
        cx = 24 + 2 * t
        f[16:52, cx - 8:cx + 8] = [120, 180, 90]
        sdc.append(f)
    VIO.save_video(sdc, str(d / "sdc.mp4"), fps=30)
    if with_bk:
        VIO.save_video([np.full((H, W, 3), 40, np.uint8)] * T,
                       str(d / "bk.mp4"), fps=30)
        VIO.save_video([np.full((H, W, 3), 90, np.uint8)] * T,
                       str(d / "vid.mp4"), fps=30)
    if with_occ:
        occ = np.zeros((T, H, W, 3), np.uint8)
        occ[:, 48:, :16] = 255
        VIO.save_video(list(occ), str(d / "occ.mp4"), fps=30)
    json.dump({"fps": 30, "time_crop": {"start_idx": 0, "end_idx": T},
               "frame_crop": None, "layer_recover": True},
              open(d / "config.json", "w"))
    return str(d)


def _ref_image():
    ref = np.full((80, 60, 3), 255, np.uint8)
    ref[16:70, 18:42] = [30, 60, 160]
    return ref


def test_animate_flow(tiny_runner, tmp_path):
    tpl = _make_template(tmp_path)
    video = AN.animate(tiny_runner, _ref_image(), tpl, width=32, height=32,
                       steps=2, cfg_scale=3.5, seed=0)
    assert video.shape[0] == 5
    assert video.shape[3] == 3
    assert np.isfinite(video).all()
    assert 0.0 <= video.min() and video.max() <= 1.0


def test_edit_flow_with_occ(tiny_runner, tmp_path):
    tpl = _make_template(tmp_path, with_bk=True, with_occ=True)
    frames = ED.edit(tiny_runner, _ref_image(), tpl, width=32, height=32,
                     steps=2, cfg_scale=3.5, seed=0)
    assert len(frames) == 5
    f0 = frames[0]
    assert f0.dtype == np.uint8
    # occluded corner shows the source video (90s), not background (40s)
    assert abs(int(f0[60, 8, 0]) - 90) < 25


def test_edit_requires_bk(tiny_runner, tmp_path):
    tpl = _make_template(tmp_path, with_bk=False)
    with pytest.raises(FileNotFoundError, match="bk.mp4"):
        ED.edit(tiny_runner, _ref_image(), tpl, width=32, height=32,
                steps=1, cfg_scale=1.0, seed=0)


def test_generate_with_interpolation_factor():
    """interpolation_factor=2 upsamples F frames to (F-1)*2+1 before decode
    (reference pipeline...roiclip.py:293-337,566-567)."""
    import jax
    import jax.numpy as jnp
    from mimo_tpu import config as C
    from mimo_tpu.pipelines import pose2vid

    cfg = C.tiny_mimo_config()
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    from mimo_tpu.models import unet as U, vae as V, clip_vision as CV, \
        pose_guider as PG
    params = {
        "reference_unet": U.unet_init(ks[0], cfg.reference_unet),
        "denoising_unet": U.unet_init(ks[1], cfg.denoising_unet),
        "pose_guider": PG.pose_guider_init(ks[2], cfg.pose_guider),
        "vae": V.vae_init(ks[3], cfg.vae),
        "clip": CV.clip_vision_init(ks[4], cfg.clip_vision),
    }
    F, H, W = 4, 32, 32
    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5, interpolation_factor=2)
    ds = cfg.vae.downscale
    out = pose2vid.generate_host_loop(
        params, st,
        jax.random.uniform(ks[5], (H, W, 3)) * 2 - 1,
        jax.random.uniform(ks[5], (F, H, W, 3)),
        jax.random.uniform(ks[5], (F, H, W, 3)) * 2 - 1,
        jax.random.normal(ks[5], (cfg.clip_vision.image_size,
                                  cfg.clip_vision.image_size, 3)),
        jax.random.normal(ks[5], (F, H // ds, W // ds, 4)))
    assert out.shape == ((F - 1) * 2 + 1, H, W, 3)
