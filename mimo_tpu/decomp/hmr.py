"""HMR2 / HaMeR: 3D body and hand parameter regression.

Reference: video_decomp/hmr2/ (6.8k LoC) and video_decomp/hamer/ (5.5k LoC)
— both are a ViT-H backbone + a small cross-attention transformer decoder
head with iterative-error-feedback 6D-rotation outputs:
- `HMR2` (hmr2/models/hmr2.py:18, forward :255), head
  `SMPLTransformerDecoderHead` (models/heads/smpl_head.py:17,57): one query
  token cross-attends to image tokens, then linears predict Δ(pose 24x6D,
  betas 10, cam 3) added to mean params, 3 IEF iterations.
- `HAMER` (hamer/models/hamer.py:18): same with MANO (16x6D, betas 10).
- crop handling: `ViTDetDataset` square crops (hmr2/datasets/
  vitdet_dataset.py:16; hands use rescale_factor=2.0, run.py:679).
- `cam_crop_to_full` weak-perspective lift (hmr2/utils/renderer.py:19-29).

Person/hand crops batch in the leading axis; one jit per model.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp.vit import ViTConfig, vit_init, vit_apply
from mimo_tpu.decomp.transforms import rot6d_to_rotmat
from mimo_tpu.models import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class HMRConfig:
    backbone: ViTConfig = field(default_factory=lambda: ViTConfig(
        img_size=(256, 192), patch_size=16, dim=1280, depth=32,
        num_heads=16, use_cls_token=False))
    num_joints: int = 24            # SMPL (HaMeR/MANO: 16)
    num_betas: int = 10
    head_dim: int = 1024
    head_layers: int = 6
    head_heads: int = 8
    ief_iters: int = 3


def hamer_config() -> HMRConfig:
    return HMRConfig(num_joints=16)


def tiny_hmr_config(num_joints: int = 5) -> HMRConfig:
    return HMRConfig(
        backbone=ViTConfig(img_size=(32, 32), patch_size=16, dim=32,
                           depth=2, num_heads=4, use_cls_token=False),
        num_joints=num_joints, num_betas=4, head_dim=32, head_layers=2,
        head_heads=4, ief_iters=2)


def hmr_init(key, cfg: HMRConfig) -> Params:
    keys = iter(jax.random.split(key, 8 + 6 * cfg.head_layers))
    d = cfg.head_dim
    npose = cfg.num_joints * 6
    layers = []
    for _ in range(cfg.head_layers):
        layers.append({
            "ln1": L.layer_norm_init(d),
            "self": L.mha_init(next(keys), d),
            "ln2": L.layer_norm_init(d),
            "cross": L.mha_init(next(keys), d,
                                context_dim=cfg.backbone.dim),
            "ln3": L.layer_norm_init(d),
            "ff": L.geglu_ff_init(next(keys), d),
        })
    return {
        "backbone": vit_init(next(keys), cfg.backbone),
        "token": jnp.zeros((d,)),
        "in_proj": L.linear_init(next(keys), npose + cfg.num_betas + 3, d),
        "layers": layers,
        "ln_out": L.layer_norm_init(d),
        "dec_pose": L.linear_init(next(keys), d, npose),
        "dec_betas": L.linear_init(next(keys), d, cfg.num_betas),
        "dec_cam": L.linear_init(next(keys), d, 3),
        # mean parameter priors (loaded from the published SMPL mean params
        # by the weight converter; identity-rotation 6D init here)
        "mean_pose": jnp.tile(jnp.asarray([1.0, 0, 0, 0, 1.0, 0]),
                              (cfg.num_joints,)),
        "mean_betas": jnp.zeros((cfg.num_betas,)),
        "mean_cam": jnp.asarray([0.9, 0.0, 0.0]),
    }


def hmr_forward(p: Params, cfg: HMRConfig, crops: jnp.ndarray):
    """crops: (B, H, W, 3) ImageNet-normalized. Returns dict with
    pose_rotmats (B, J, 3, 3), betas (B, nb), cam (B, 3) weak-perspective
    [s, tx, ty] in crop coords."""
    B = crops.shape[0]
    ctx = vit_apply(p["backbone"], cfg.backbone, crops)   # (B, S, D)

    pose = jnp.broadcast_to(p["mean_pose"][None], (B, cfg.num_joints * 6))
    betas = jnp.broadcast_to(p["mean_betas"][None], (B, cfg.num_betas))
    cam = jnp.broadcast_to(p["mean_cam"][None], (B, 3))

    for _ in range(cfg.ief_iters):
        token = jnp.broadcast_to(p["token"][None, None],
                                 (B, 1, cfg.head_dim)).astype(ctx.dtype)
        token = token + L.linear(
            p["in_proj"], jnp.concatenate([pose, betas, cam], axis=-1)
        ).astype(ctx.dtype)[:, None, :]
        for blk in p["layers"]:
            y = L.layer_norm(blk["ln1"], token)
            token = token + L.mha(blk["self"], y, None, cfg.head_heads)
            y = L.layer_norm(blk["ln2"], token)
            token = token + L.mha(blk["cross"], y, ctx, cfg.head_heads)
            y = L.layer_norm(blk["ln3"], token)
            token = token + L.geglu_ff(blk["ff"], y)
        feat = L.layer_norm(p["ln_out"], token)[:, 0].astype(jnp.float32)
        pose = pose + L.linear(p["dec_pose"], feat)
        betas = betas + L.linear(p["dec_betas"], feat)
        cam = cam + L.linear(p["dec_cam"], feat)

    rotmats = rot6d_to_rotmat(pose.reshape(B, cfg.num_joints, 6))
    return {"pose_rotmats": rotmats, "betas": betas, "cam": cam}


# ---------------------------------------------------------------------------
# crop + camera helpers (host side)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def square_crop(image: np.ndarray, bbox_xyxy: np.ndarray,
                out_size: Tuple[int, int] = (256, 192),
                rescale: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """ViTDetDataset-style square crop: center + max-side box scaled by
    `rescale` (hands use 2.0), resized to out_size, normalized.
    Returns (crop (H, W, 3) float, center_scale (cx, cy, size))."""
    import cv2
    x0, y0, x1, y1 = bbox_xyxy
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    size = max(x1 - x0, y1 - y0) * rescale
    half = size / 2
    H, W = image.shape[:2]
    xs0, ys0 = int(round(cx - half)), int(round(cy - half))
    xs1, ys1 = int(round(cx + half)), int(round(cy + half))
    canvas = np.zeros((ys1 - ys0, xs1 - xs0, 3), np.float32)
    sy0, sy1 = max(0, ys0), min(H, ys1)
    sx0, sx1 = max(0, xs0), min(W, xs1)
    canvas[sy0 - ys0:sy1 - ys0, sx0 - xs0:sx1 - xs0] = \
        image[sy0:sy1, sx0:sx1]
    crop = cv2.resize(canvas, (out_size[1], out_size[0]))
    crop = (crop / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return crop, np.array([cx, cy, size], np.float32)


def cam_crop_to_full(cam: np.ndarray, center_scale: np.ndarray,
                     img_w: float, img_h: float,
                     focal: float) -> np.ndarray:
    """Weak-perspective crop camera -> full-image translation
    (hmr2/utils/renderer.py:19-29): t_z = 2*focal/(s*b), t_xy recentered."""
    s, tx, ty = cam[..., 0], cam[..., 1], cam[..., 2]
    cx, cy, b = (center_scale[..., 0], center_scale[..., 1],
                 center_scale[..., 2])
    w2, h2 = img_w / 2.0, img_h / 2.0
    bs = b * s + 1e-9
    tz = 2 * focal / bs
    tx_full = (2 * (cx - w2) / bs) + tx
    ty_full = (2 * (cy - h2) / bs) + ty
    return np.stack([tx_full, ty_full, tz], axis=-1)
