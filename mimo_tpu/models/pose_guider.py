"""Pose guider: strided conv encoder mapping the sdc pose video (3ch, full
resolution) to latent-resolution features added after the denoising UNet's
conv_in.

Reference: src/models/pose_guider.py:12-57 — conv_in 3->16, then per stage
[conv3x3 (same ch), conv3x3 stride2 (next ch)], SiLU after every conv, and a
zero-initialized 3x3 output conv to embedding_channels (320). Instantiated
as PoseGuider(320, 3, (16, 32, 96, 256)) at run_edit.py:89-91.

Video frames fold into the batch (channels-last), replacing InflatedConv3d.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mimo_tpu.config import PoseGuiderConfig
from mimo_tpu.models import layers as L

Params = Dict[str, Any]


def pose_guider_init(key, cfg: PoseGuiderConfig, dtype=jnp.float32) -> Params:
    chans = cfg.block_out_channels
    keys = jax.random.split(key, 2 * len(chans) + 2)
    blocks = []
    for i in range(len(chans) - 1):
        blocks.append({
            "conv_a": L.conv2d_init(keys[2 * i], 3, 3, chans[i], chans[i],
                                    dtype=dtype),
            "conv_b": L.conv2d_init(keys[2 * i + 1], 3, 3, chans[i],
                                    chans[i + 1], dtype=dtype),
        })
    return {
        "conv_in": L.conv2d_init(keys[-2], 3, 3, cfg.conditioning_channels,
                                 chans[0], dtype=dtype),
        "blocks": blocks,
        "conv_out": L.conv2d_init(keys[-1], 3, 3, chans[-1],
                                  cfg.embedding_channels, dtype=dtype,
                                  zero=True),
    }


def pose_guider_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, F, H, W, 3) in [0, 1] -> (B, F, H/8, W/8, embedding_channels)."""
    b, f, h, w, c = x.shape
    y = x.reshape(b * f, h, w, c)
    y = L.silu(L.conv2d(p["conv_in"], y, padding=1))
    for blk in p["blocks"]:
        y = L.silu(L.conv2d(blk["conv_a"], y, padding=1))
        y = L.silu(L.conv2d(blk["conv_b"], y, stride=2, padding=1))
    y = L.conv2d(p["conv_out"], y, padding=1)
    return y.reshape(b, f, *y.shape[1:])
