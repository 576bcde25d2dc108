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
