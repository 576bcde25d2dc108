"""Golden regression check: tiny-config generation statistics must stay
stable across refactors (the reference has no tests at all — SURVEY.md §4;
this is our cross-round drift detector).

We check robust statistics (per-frame mean/std) rather than bitwise values
so the test survives jax version changes and op-fusion differences while
still catching semantic regressions (wrong scheduler step, mis-wired
conditioning, broken overlap averaging).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu import config as C
from mimo_tpu.pipelines import pose2vid
from tests.test_pipeline import tiny_params, tiny_inputs

# Recorded per-frame mean/std of the fixed-seed tiny generation (seed 0/1
# via tiny_params/tiny_inputs, 6 frames 32x32, 2 DDIM steps, CPU fp32).
# A deliberate scheduler off-by-one, mis-wired conditioning, or broken
# overlap averaging shifts these far beyond the tolerance. If an INTENDED
# semantic change moves them, re-record (the recording snippet is in the
# repo history) and say why in the commit message.
GOLDEN_MEAN = np.array([0.55808467, 0.54674804, 0.55688363, 0.54973394,
                        0.5558678, 0.54954225], np.float32)
GOLDEN_STD = np.array([0.15254009, 0.15522742, 0.14453574, 0.15716182,
                       0.15212655, 0.15077585], np.float32)


def _generate():
    cfg = C.tiny_mimo_config()
    F, H, W = 6, 32, 32
    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5)
    params = tiny_params(cfg)
    inputs = tiny_inputs(cfg, F, H, W)
    return np.asarray(pose2vid.generate_fn(params, st, *inputs))


def test_generation_deterministic():
    a = _generate()
    b = _generate()
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_generation_statistics_sane():
    v = _generate()
    assert v.shape == (6, 32, 32, 3)
    m = v.mean(axis=(1, 2, 3))
    s = v.std(axis=(1, 2, 3))
    # random-weight generations land mid-range with nontrivial variance
    assert (m > 0.05).all() and (m < 0.95).all(), m
    assert (s > 0.01).all(), s
    # frames differ from each other (temporal conditioning has effect)
    assert np.abs(np.diff(m)).max() > 1e-5


def test_generation_matches_recorded_golden():
    """Numerical drift detector: recorded per-frame statistics at 1e-4.
    Sensitivity check at record time: shifting the DDIM timestep schedule
    by one index moved the means by 2.1e-3 — 20x this tolerance — so a
    scheduler off-by-one fails the test."""
    v = _generate()
    m = v.mean(axis=(1, 2, 3))
    s = v.std(axis=(1, 2, 3))
    np.testing.assert_allclose(m, GOLDEN_MEAN, atol=1e-4)
    np.testing.assert_allclose(s, GOLDEN_STD, atol=1e-4)


# Per-block activation goldens (VERDICT r2 weak #6): the e2e mean/std golden
# can be fooled by a compensating pair of numeric bugs; these pin the tiny
# denoising UNet's intermediate activations block by block. Recorded with
# tests/..: the recording snippet lives in the repo history (round 3,
# "per-block checksum goldens"); re-record only for INTENDED semantic
# changes and say why in the commit message.
# name -> (mean, mean(|x|)) of the block output, fp64, CPU.
GOLDEN_BLOCKS = {
    "down3": (4.1432921824e-03, 3.3768451870e-01),
    "down5": (-2.4182543403e-02, 2.1637118455e-01),
    "down7": (1.6561838895e-02, 1.7874276415e-01),
    "down8": (-2.6807856812e-03, 1.8940836906e-01),
    "mid": (-4.7484789306e-02, 4.2331871387e-01),
    "up6": (7.3795739791e-03, 6.6528680469e-02),
    "up4": (-8.3753173154e-03, 2.2862188621e-01),
    "up2": (-3.1988478889e-02, 2.3831180047e-01),
    "up0": (6.3563742309e-02, 5.0378203346e-01),
    "out": (-9.0988840606e-02, 2.7426960753e-01),
}


def test_per_block_activation_goldens():
    from mimo_tpu.models import unet as U
    cfg = C.tiny_mimo_config()
    params = U.unet_init(jax.random.split(jax.random.PRNGKey(1), 1)[0],
                         cfg.denoising_unet)
    F, H, W = 4, 8, 8
    kk = jax.random.split(jax.random.PRNGKey(2), 4)
    x = jax.random.normal(kk[0], (1, F, H, W, 8))
    t = jnp.asarray(421.0)
    ctx = jax.random.normal(
        kk[1], (1, 1, cfg.denoising_unet.cross_attention_dim))
    taps = {}
    U._TAP = lambda name, h: taps.__setitem__(name, np.asarray(h, np.float64))
    try:
        out = U.unet3d_apply(params, cfg.denoising_unet, x, t, ctx,
                             None, None)
    finally:
        U._TAP = None
    taps["out"] = np.asarray(out, np.float64)
    assert set(taps) == set(GOLDEN_BLOCKS), (sorted(taps),
                                             sorted(GOLDEN_BLOCKS))
    for name, (gm, ga) in GOLDEN_BLOCKS.items():
        a = taps[name]
        np.testing.assert_allclose(a.mean(), gm, atol=2e-6, err_msg=name)
        np.testing.assert_allclose(np.abs(a).mean(), ga, atol=2e-6,
                                   err_msg=name)
