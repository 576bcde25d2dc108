"""KL-VAE (sd-vae-ft-mse / SD1.5 AutoencoderKL), channels-last, frames
batched.

The reference loads diffusers' AutoencoderKL (run_edit.py:71-73) and uses
only `encode(...).latent_dist.mean * 0.18215` (pipeline...roiclip.py:423-443)
and `decode(latents / 0.18215)` per frame (pipeline...roiclip.py:113-126).
Here encode/decode take a whole frame batch at once — the per-frame Python
loops of the reference become one batched device program.

Architecture (standard SD KL-VAE):
- encoder: conv_in 3->128; 4 down stages (128,256,512,512) of 2 resnets,
  stages 0-2 followed by an asymmetrically padded stride-2 conv
  (diffusers Downsample2D pads (0,1),(0,1)); mid = resnet, single-head
  attention, resnet; GN(eps 1e-6) + SiLU; conv_out 512->8; quant_conv 1x1.
- decoder: post_quant_conv 1x1; conv_in 4->512; mid as above; 4 up stages
  (512,512,256,128) of 3 resnets, first three followed by nearest-2x
  upsample + conv; GN + SiLU; conv_out 128->3.
- VAE resnets have no time embedding; all GroupNorms are eps 1e-6.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mimo_tpu.config import VAEConfig
from mimo_tpu.models import layers as L
from mimo_tpu.models.unet import resnet_init, resnet_apply

Params = Dict[str, Any]

_EPS = 1e-6


def _attn_init(key, channels: int, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "norm": L.group_norm_init(channels, dtype),
        "to_q": L.linear_init(k1, channels, channels, dtype=dtype),
        "to_k": L.linear_init(k2, channels, channels, dtype=dtype),
        "to_v": L.linear_init(k3, channels, channels, dtype=dtype),
        "to_out": L.linear_init(k4, channels, channels, dtype=dtype),
    }


def _attn_apply(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Single-head full self-attention over spatial tokens (VAE mid-block)."""
    n, h, w, c = x.shape
    res = x
    y = L.group_norm(p["norm"], x, groups, _EPS,
                     barrier=False, fused=True)  # feeds matmuls (qkv projections)
    t = y.reshape(n, h * w, c)
    q = L.linear(p["to_q"], t)
    k = L.linear(p["to_k"], t)
    v = L.linear(p["to_v"], t)
    o = L.sdpa(q, k, v, heads=1)
    o = L.linear(p["to_out"], o)
    return res + o.reshape(n, h, w, c)


def _mid_init(key, channels: int, dtype) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "resnet1": resnet_init(k1, channels, channels, None, dtype),
        "attn": _attn_init(k2, channels, dtype),
        "resnet2": resnet_init(k3, channels, channels, None, dtype),
    }


def _mid_apply(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    x = resnet_apply(p["resnet1"], x, None, groups, _EPS, fused_gn=True)
    x = _attn_apply(p["attn"], x, groups)
    return resnet_apply(p["resnet2"], x, None, groups, _EPS, fused_gn=True)


# ---------------------------------------------------------------------------


def vae_init(key, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 128))
    ch = cfg.block_out_channels
    g = cfg.norm_num_groups

    # encoder
    enc: Params = {"conv_in": L.conv2d_init(next(keys), 3, 3,
                                            cfg.sample_channels, ch[0],
                                            dtype=dtype)}
    downs = []
    c_prev = ch[0]
    for i, c_out in enumerate(ch):
        blk = {"resnets": [resnet_init(next(keys),
                                       c_prev if j == 0 else c_out,
                                       c_out, None, dtype)
                           for j in range(cfg.layers_per_block)]}
        blk["downsample"] = (L.conv2d_init(next(keys), 3, 3, c_out, c_out,
                                           dtype=dtype)
                             if i < len(ch) - 1 else None)
        downs.append(blk)
        c_prev = c_out
    enc["down"] = downs
    enc["mid"] = _mid_init(next(keys), ch[-1], dtype)
    enc["norm_out"] = L.group_norm_init(ch[-1], dtype)
    enc["conv_out"] = L.conv2d_init(next(keys), 3, 3, ch[-1],
                                    2 * cfg.latent_channels, dtype=dtype)

    # decoder
    dec: Params = {"conv_in": L.conv2d_init(next(keys), 3, 3,
                                            cfg.latent_channels, ch[-1],
                                            dtype=dtype)}
    dec["mid"] = _mid_init(next(keys), ch[-1], dtype)
    ups = []
    rev = list(reversed(ch))
    c_prev = ch[-1]
    for i, c_out in enumerate(rev):
        blk = {"resnets": [resnet_init(next(keys),
                                       c_prev if j == 0 else c_out,
                                       c_out, None, dtype)
                           for j in range(cfg.layers_per_block + 1)]}
        blk["upsample"] = (L.conv2d_init(next(keys), 3, 3, c_out, c_out,
                                         dtype=dtype)
                           if i < len(rev) - 1 else None)
        ups.append(blk)
        c_prev = c_out
    dec["up"] = ups
    dec["norm_out"] = L.group_norm_init(ch[0], dtype)
    dec["conv_out"] = L.conv2d_init(next(keys), 3, 3, ch[0],
                                    cfg.sample_channels, dtype=dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": L.conv2d_init(next(keys), 1, 1, 2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, dtype=dtype),
        "post_quant_conv": L.conv2d_init(next(keys), 1, 1,
                                         cfg.latent_channels,
                                         cfg.latent_channels, dtype=dtype),
    }


def encode_mean(p: Params, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: (N, H, W, 3) in [-1, 1] -> latent mean (N, H/8, W/8, 4), already
    scaled by cfg.scaling_factor (the reference multiplies the mean by
    0.18215 at pipeline...roiclip.py:430-431)."""
    g = cfg.norm_num_groups
    enc = p["encoder"]
    h = L.conv2d(enc["conv_in"], x, padding=1)
    for blk in enc["down"]:
        for rp in blk["resnets"]:
            h = resnet_apply(rp, h, None, g, _EPS, fused_gn=True)
        if blk["downsample"] is not None:
            # diffusers Downsample2D: asymmetric (0,1) pad, VALID conv
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = jax.lax.conv_general_dilated(
                h, blk["downsample"]["kernel"].astype(h.dtype), (2, 2),
                padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = h + blk["downsample"]["bias"].astype(h.dtype)
    h = _mid_apply(enc["mid"], h, g)
    h = L.group_norm(enc["norm_out"], h, g, _EPS, fuse_silu=True, fused=True)
    h = L.conv2d(enc["conv_out"], h, padding=1)
    h = L.conv2d(p["quant_conv"], h, padding=0)
    mean = h[..., : cfg.latent_channels]
    return mean * cfg.scaling_factor


def decode(p: Params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z: (N, h, w, 4) scaled latents -> (N, 8h, 8w, 3) in [-1, 1]."""
    g = cfg.norm_num_groups
    z = z / cfg.scaling_factor
    dec = p["decoder"]
    h = L.conv2d(p["post_quant_conv"], z, padding=0)
    h = L.conv2d(dec["conv_in"], h, padding=1)
    h = _mid_apply(dec["mid"], h, g)
    for blk in dec["up"]:
        for rp in blk["resnets"]:
            h = resnet_apply(rp, h, None, g, _EPS, fused_gn=True)
        if blk["upsample"] is not None:
            h = L.upsample_nearest_2x(h)
            h = L.conv2d(blk["upsample"], h, padding=1)
    h = L.group_norm(dec["norm_out"], h, g, _EPS, fuse_silu=True, fused=True)
    return L.conv2d(dec["conv_out"], h, padding=1)
