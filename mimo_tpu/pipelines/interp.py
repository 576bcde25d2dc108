"""Latent frame interpolation (optional frame-rate upsampling).

Reference: src/pipelines/utils.py:10-29 (slerp / linear) +
pipeline...roiclip.py:293-337 interpolate_latents — inserts
`interpolation_factor - 1` interpolated latents between consecutive frames.
"""

from __future__ import annotations

import jax.numpy as jnp


def lerp(v0: jnp.ndarray, v1: jnp.ndarray, t: float) -> jnp.ndarray:
    return (1 - t) * v0 + t * v1


def slerp(v0: jnp.ndarray, v1: jnp.ndarray, t: float,
          dot_threshold: float = 0.9995) -> jnp.ndarray:
    """Spherical interpolation over flattened latents; falls back to lerp
    when the vectors are nearly parallel (reference utils.py:10-24)."""
    f0 = v0.astype(jnp.float32).reshape(-1)
    f1 = v1.astype(jnp.float32).reshape(-1)
    n0 = f0 / jnp.linalg.norm(f0)
    n1 = f1 / jnp.linalg.norm(f1)
    dot = jnp.clip(jnp.sum(n0 * n1), -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    w0 = jnp.sin((1 - t) * theta) / sin_theta
    w1 = jnp.sin(t * theta) / sin_theta
    out = w0 * f0 + w1 * f1
    out = jnp.where(jnp.abs(dot) > dot_threshold,
                    (1 - t) * f0 + t * f1, out)
    return out.reshape(v0.shape).astype(v0.dtype)


def interpolate_latents(latents: jnp.ndarray, factor: int,
                        mode: str = "slerp") -> jnp.ndarray:
    """latents: (F, h, w, c) -> ((F-1)*factor + 1, h, w, c). factor < 2 is a
    no-op (reference interpolate_latents, pipeline...roiclip.py:293-337)."""
    if factor < 2:
        return latents
    fn = slerp if mode == "slerp" else lerp
    F = latents.shape[0]
    out = []
    for i in range(F - 1):
        out.append(latents[i])
        for k in range(1, factor):
            out.append(fn(latents[i], latents[i + 1], k / factor))
    out.append(latents[-1])
    return jnp.stack(out)
