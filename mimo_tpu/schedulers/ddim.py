"""DDIM sampler: v-prediction, zero-SNR beta rescale, trailing timestep
spacing — the exact noise-schedule configuration of the reference
(configs/inference/inference_v2.yaml:24-33, consumed by diffusers
DDIMScheduler at run_edit.py:97-98).

Pure-functional: schedule tables are precomputed numpy constants; `step` is
a jit-safe pure function indexed by the step counter (all shapes static).

Math (standard DDIM, Song et al. 2020; zero-SNR rescale per Lin et al. 2023
"Common Diffusion Noise Schedules and Sample Steps are Flawed"):
- scaled_linear betas: linspace(sqrt(b0), sqrt(bT), T)^2
- zero-SNR: rescale sqrt(alpha_bar) affinely so the terminal value is 0
- trailing spacing: t_i = round(T - i*T/S) - 1 for i in 0..S-1
- v-prediction: x0 = sqrt(a_t) x - sqrt(1-a_t) v ; eps = sqrt(a_t) v +
  sqrt(1-a_t) x ; x_{t_prev} = sqrt(a_prev) x0 + sqrt(1-a_prev) eps (eta=0)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from mimo_tpu.config import SchedulerConfig


def _make_alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, T,
                            dtype=np.float64) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, T, dtype=np.float64)
    else:
        raise ValueError(cfg.beta_schedule)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)

    if cfg.rescale_betas_zero_snr:
        sqrt_acp = np.sqrt(acp)
        a0, aT = sqrt_acp[0], sqrt_acp[-1]
        sqrt_acp = (sqrt_acp - aT) * (a0 / (a0 - aT))
        acp = sqrt_acp ** 2
    return acp


@dataclass(frozen=True)
class DDIM:
    """Precomputed DDIM tables for a fixed number of inference steps."""

    timesteps: np.ndarray          # (S,) int32, descending
    alpha_t: np.ndarray            # (S,) alpha_cumprod at t
    alpha_prev: np.ndarray         # (S,) alpha_cumprod at prev t (1.0 past end)

    init_noise_sigma: float = 1.0  # DDIM: identity input scaling

    @staticmethod
    def create(cfg: SchedulerConfig, num_inference_steps: int) -> "DDIM":
        T = cfg.num_train_timesteps
        S = num_inference_steps
        acp = _make_alphas_cumprod(cfg)

        if cfg.timestep_spacing == "trailing":
            ts = np.round(np.arange(T, 0, -T / S)).astype(np.int64) - 1
        elif cfg.timestep_spacing == "leading":
            step_ratio = T // S
            ts = (np.arange(0, S) * step_ratio).round()[::-1].astype(np.int64)
            ts += cfg.steps_offset
        else:
            raise ValueError(cfg.timestep_spacing)

        prev_ts = ts - T // S
        alpha_t = acp[ts]
        alpha_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, T - 1)],
                              1.0)  # final_alpha_cumprod = 1 (set_alpha_to_one)
        return DDIM(timesteps=ts.astype(np.int32),
                    alpha_t=alpha_t.astype(np.float32),
                    alpha_prev=alpha_prev.astype(np.float32))

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    def step_v(self, v: jnp.ndarray, step_index, x: jnp.ndarray,
               alpha_t=None, alpha_prev=None) -> jnp.ndarray:
        """One eta=0 DDIM update under v-prediction.

        `step_index` may be a traced integer (used with lax.scan); the alpha
        tables are gathered with dynamic indexing. fp32 internally.
        """
        a_t = (jnp.asarray(self.alpha_t)[step_index]
               if alpha_t is None else alpha_t)
        a_p = (jnp.asarray(self.alpha_prev)[step_index]
               if alpha_prev is None else alpha_prev)
        xf = x.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        sqrt_a, sqrt_b = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
        x0 = sqrt_a * xf - sqrt_b * vf
        eps = sqrt_a * vf + sqrt_b * xf
        prev = jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps
        return prev.astype(x.dtype)

    def add_noise_v_target(self, x0: jnp.ndarray, noise: jnp.ndarray,
                           step_index: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(x_t, v_target) pair for training/testing round-trips."""
        a_t = jnp.asarray(self.alpha_t)[step_index]
        sqrt_a, sqrt_b = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
        x_t = sqrt_a * x0 + sqrt_b * noise
        v = sqrt_a * noise - sqrt_b * x0
        return x_t, v
