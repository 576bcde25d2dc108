"""DepthAnythingV2: DINOv2 encoder + DPT fusion head → relative depth.

Reference: video_decomp/depth_anything_v2/ (dpt.py:153-200 DepthAnythingV2,
dinov2.py DINOv2 ViT-L, dpt.py:38 DPTHead). Used by the occlusion stage to
depth-order candidate objects against the person (demo_occ.py:210-215,
574-662). Inference contract matches `infer_image`: resize to 518 (multiple
of 14), normalize, forward, bilinear-resize depth back to the input size.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from mimo_tpu.decomp.vit import ViTConfig, vit_init, vit_apply, tokens_to_grid
from mimo_tpu.models import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class DepthAnythingConfig:
    encoder: ViTConfig = field(default_factory=lambda: ViTConfig(
        img_size=(518, 518), patch_size=14, dim=1024, depth=24,
        num_heads=16, use_cls_token=True, layer_scale=True))
    # blocks tapped for the DPT pyramid (vitl: 4, 11, 17, 23)
    tap_blocks: Tuple[int, ...] = (4, 11, 17, 23)
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    features: int = 256


def tiny_depth_config() -> DepthAnythingConfig:
    return DepthAnythingConfig(
        encoder=ViTConfig(img_size=(56, 56), patch_size=14, dim=32, depth=4,
                          num_heads=4, use_cls_token=True, layer_scale=True),
        tap_blocks=(0, 1, 2, 3),
        out_channels=(16, 16, 32, 32),
        features=16,
    )


def _rcu_init(key, ch: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"conv1": L.conv2d_init(k1, 3, 3, ch, ch),
            "conv2": L.conv2d_init(k2, 3, 3, ch, ch)}


def _rcu_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = L.conv2d(p["conv1"], jax.nn.relu(x), padding=1)
    h = L.conv2d(p["conv2"], jax.nn.relu(h), padding=1)
    return x + h


def depth_anything_init(key, cfg: DepthAnythingConfig) -> Params:
    keys = iter(jax.random.split(key, 64))
    f = cfg.features
    p: Params = {"encoder": vit_init(next(keys), cfg.encoder)}
    p["projects"] = [L.conv2d_init(next(keys), 1, 1, cfg.encoder.dim, oc)
                     for oc in cfg.out_channels]
    # per-level resize to the 4-scale pyramid: 4x up, 2x up, 1x, 2x down
    p["resize"] = [
        {"kind": "up4", "conv": L.conv2d_init(next(keys), 3, 3,
                                              cfg.out_channels[0],
                                              cfg.out_channels[0])},
        {"kind": "up2", "conv": L.conv2d_init(next(keys), 3, 3,
                                              cfg.out_channels[1],
                                              cfg.out_channels[1])},
        {"kind": "id"},
        {"kind": "down2", "conv": L.conv2d_init(next(keys), 3, 3,
                                                cfg.out_channels[3],
                                                cfg.out_channels[3])},
    ]
    p["scratch"] = [L.conv2d_init(next(keys), 3, 3, oc, f, bias=False)
                    for oc in cfg.out_channels]
    p["fuse"] = [{"rcu1": _rcu_init(next(keys), f),
                  "rcu2": _rcu_init(next(keys), f),
                  "project": L.conv2d_init(next(keys), 1, 1, f, f)}
                 for _ in range(4)]
    p["head1"] = L.conv2d_init(next(keys), 3, 3, f, f // 2)
    p["head2"] = L.conv2d_init(next(keys), 3, 3, f // 2, 32)
    p["head3"] = L.conv2d_init(next(keys), 1, 1, 32, 1)
    return p


def _resize_bilinear(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], th, tw, x.shape[-1]),
                            method="bilinear")


def depth_forward(p: Params, cfg: DepthAnythingConfig,
                  pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: (B, H, W, 3) ImageNet-normalized, H/W multiples of
    patch_size. Returns relative depth (B, H, W), >= 0."""
    b, H, W, _ = pixels.shape
    gh, gw = H // cfg.encoder.patch_size, W // cfg.encoder.patch_size
    _, inter = vit_apply(p["encoder"], cfg.encoder, pixels,
                         return_intermediates=list(cfg.tap_blocks))

    feats = []
    for lvl, tokens in enumerate(inter):
        g = tokens_to_grid(tokens, cfg.encoder, gh, gw)
        g = L.conv2d(p["projects"][lvl], g, padding=0)
        rz = p["resize"][lvl]
        if rz["kind"] == "up4":
            g = _resize_bilinear(g, gh * 4, gw * 4)
            g = L.conv2d(rz["conv"], g, padding=1)
        elif rz["kind"] == "up2":
            g = _resize_bilinear(g, gh * 2, gw * 2)
            g = L.conv2d(rz["conv"], g, padding=1)
        elif rz["kind"] == "down2":
            g = L.conv2d(rz["conv"], g, stride=2, padding=1)
        feats.append(L.conv2d(p["scratch"][lvl], g, padding=1))

    # top-down fusion (RefineNet style)
    path = None
    for lvl in (3, 2, 1, 0):
        x = feats[lvl]
        fz = p["fuse"][lvl]
        if path is not None:
            path = _resize_bilinear(path, x.shape[1], x.shape[2])
            x = x + _rcu_apply(fz["rcu1"], path)
        x = _rcu_apply(fz["rcu2"], x)
        path = L.conv2d(fz["project"], x, padding=0)

    out = _resize_bilinear(path, gh * 8, gw * 8)
    out = jax.nn.relu(L.conv2d(p["head1"], out, padding=1))
    out = jax.nn.relu(L.conv2d(p["head2"], out, padding=1))
    out = jax.nn.relu(L.conv2d(p["head3"], out, padding=0))
    depth = _resize_bilinear(out, H, W)[..., 0]
    return depth


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def infer_depth(p: Params, cfg: DepthAnythingConfig, image01: jnp.ndarray,
                input_size: int = 518) -> jnp.ndarray:
    """Match the reference infer_image contract (dpt.py:187-200): resize to
    ~input_size (multiple of patch), normalize, forward, resize back.
    image01: (H, W, 3) in [0, 1]."""
    H, W = image01.shape[:2]
    ps = cfg.encoder.patch_size
    s = input_size / min(H, W)
    nh = max(ps, int(round(H * s / ps)) * ps)
    nw = max(ps, int(round(W * s / ps)) * ps)
    x = jax.image.resize(image01, (nh, nw, 3), method="bilinear")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    d = depth_forward(p, cfg, x[None])[0]
    return jax.image.resize(d, (H, W), method="bilinear")
