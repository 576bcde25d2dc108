"""DDIM (v-pred, zero-SNR, trailing) schedule tests against the published
formulas (diffusers DDIMScheduler semantics per inference_v2.yaml:24-33)."""

import numpy as np
import jax.numpy as jnp

from mimo_tpu.config import SchedulerConfig
from mimo_tpu.schedulers.ddim import DDIM, _make_alphas_cumprod


def test_zero_snr_terminal_alpha():
    acp = _make_alphas_cumprod(SchedulerConfig())
    assert acp[-1] == 0.0  # zero terminal SNR
    assert acp[0] > 0.99


def test_trailing_timesteps_25():
    d = DDIM.create(SchedulerConfig(), 25)
    assert d.timesteps[0] == 999
    assert d.timesteps[-1] == 39
    assert len(d.timesteps) == 25
    diffs = np.diff(d.timesteps)
    assert (diffs == -40).all()


def test_trailing_timesteps_30():
    d = DDIM.create(SchedulerConfig(), 30)
    want = np.round(np.arange(1000, 0, -1000 / 30)).astype(int) - 1
    np.testing.assert_array_equal(d.timesteps, want)


def test_alpha_prev_final_is_one():
    d = DDIM.create(SchedulerConfig(), 25)
    # last step: prev_t = 39 - 40 = -1 -> final_alpha_cumprod = 1
    assert d.alpha_prev[-1] == 1.0


def test_step_v_formula():
    d = DDIM.create(SchedulerConfig(), 25)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    v = rng.standard_normal((2, 3, 4)).astype(np.float32)
    i = 7
    got = np.asarray(d.step_v(jnp.asarray(v), i, jnp.asarray(x)))
    a_t, a_p = d.alpha_t[i], d.alpha_prev[i]
    x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * v
    eps = np.sqrt(a_t) * v + np.sqrt(1 - a_t) * x
    want = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_perfect_v_recovers_x0_at_last_step():
    """At the final step alpha_prev == 1, so a perfect v-prediction yields
    exactly pred_x0."""
    d = DDIM.create(SchedulerConfig(), 25)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((4, 4)).astype(np.float32)
    noise = rng.standard_normal((4, 4)).astype(np.float32)
    i = d.num_steps - 1
    x_t, v = d.add_noise_v_target(jnp.asarray(x0), jnp.asarray(noise), i)
    out = np.asarray(d.step_v(v, i, x_t))
    np.testing.assert_allclose(out, x0, rtol=1e-4, atol=1e-4)


def test_first_step_pure_noise_v():
    """Zero-SNR: at t=999 alpha_t == 0, so x_t == noise and v == -x0."""
    d = DDIM.create(SchedulerConfig(), 25)
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((4, 4)).astype(np.float32)
    noise = rng.standard_normal((4, 4)).astype(np.float32)
    x_t, v = d.add_noise_v_target(jnp.asarray(x0), jnp.asarray(noise), 0)
    np.testing.assert_allclose(np.asarray(x_t), noise, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), -x0, atol=1e-5)
