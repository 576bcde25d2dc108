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
        num_heads=16, use_cls_token=False, patch_padding=4,
        cls_pos_to_all=True))
    num_joints: int = 24            # SMPL (HaMeR/MANO: 16)
    num_betas: int = 10
    head_dim: int = 1024            # TRANSFORMER_DECODER dim
    head_layers: int = 6            # depth
    head_heads: int = 8
    head_dim_head: int = 64         # dim_head (inner = 512, NOT head_dim)
    mlp_dim: int = 1024
    ief_iters: int = 1              # reference default (smpl_head.py:79)
    transformer_input: str = "zero"  # 'zero' | 'mean_shape' (smpl_head:27)


def hamer_config() -> HMRConfig:
    return HMRConfig(num_joints=16)


def tiny_hmr_config(num_joints: int = 5) -> HMRConfig:
    return HMRConfig(
        backbone=ViTConfig(img_size=(32, 32), patch_size=16, dim=32,
                           depth=2, num_heads=4, use_cls_token=False,
                           patch_padding=4, cls_pos_to_all=True),
        num_joints=num_joints, num_betas=4, head_dim=32, head_layers=2,
        head_heads=4, head_dim_head=8, mlp_dim=32, ief_iters=2,
        transformer_input="mean_shape")


def hmr_init(key, cfg: HMRConfig) -> Params:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.head_layers))
    d = cfg.head_dim
    inner = cfg.head_heads * cfg.head_dim_head
    npose = cfg.num_joints * 6
    token_dim = npose + cfg.num_betas + 3 \
        if cfg.transformer_input == "mean_shape" else 1
    layers = []
    for _ in range(cfg.head_layers):
        layers.append({
            # pose_transformer.py Attention/CrossAttention: packed qkv
            # WITHOUT bias, output proj WITH bias
            "ln1": L.layer_norm_init(d),
            "qkv": L.linear_init(next(keys), d, 3 * inner, bias=False),
            "attn_out": L.linear_init(next(keys), inner, d),
            "ln2": L.layer_norm_init(d),
            "to_q": L.linear_init(next(keys), d, inner, bias=False),
            "to_kv": L.linear_init(next(keys), cfg.backbone.dim,
                                   2 * inner, bias=False),
            "cross_out": L.linear_init(next(keys), inner, d),
            "ln3": L.layer_norm_init(d),
            "fc1": L.linear_init(next(keys), d, cfg.mlp_dim),
            "fc2": L.linear_init(next(keys), cfg.mlp_dim, d),
        })
    return {
        "backbone": vit_init(next(keys), cfg.backbone),
        "token_embed": L.linear_init(next(keys), token_dim, d),
        "pos_embed": jax.random.normal(next(keys), (1, d)),
        "layers": layers,
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


def _head_attn(q_in, kv_in, qkv_or_q, to_kv, out_p, heads, dim_head):
    """pose_transformer.py Attention (packed) / CrossAttention: softmax
    (QK^T / sqrt(dim_head)) V with inner dim heads*dim_head."""
    inner = heads * dim_head
    if to_kv is None:
        qkv = L.linear(qkv_or_q, q_in)
        q, k, v = (qkv[..., :inner], qkv[..., inner:2 * inner],
                   qkv[..., 2 * inner:])
    else:
        q = L.linear(qkv_or_q, q_in)
        kv = L.linear(to_kv, kv_in)
        k, v = kv[..., :inner], kv[..., inner:]
    b, sq, _ = q.shape
    sk = k.shape[1]
    o = jax.nn.dot_product_attention(
        q.reshape(b, sq, heads, dim_head), k.reshape(b, sk, heads, dim_head),
        v.reshape(b, sk, heads, dim_head))
    return L.linear(out_p, o.reshape(b, sq, inner))


def hmr_forward(p: Params, cfg: HMRConfig, crops: jnp.ndarray):
    """SMPLTransformerDecoderHead (smpl_head.py:17-120) on the ViT
    backbone. crops: (B, H, W, 3) ImageNet-normalized. Returns dict with
    pose_rotmats (B, J, 3, 3), betas (B, nb), cam (B, 3) weak-perspective
    [s, tx, ty] in crop coords."""
    B = crops.shape[0]
    ctx = vit_apply(p["backbone"], cfg.backbone, crops)   # (B, S, D)

    pose = jnp.broadcast_to(p["mean_pose"][None], (B, cfg.num_joints * 6))
    betas = jnp.broadcast_to(p["mean_betas"][None], (B, cfg.num_betas))
    cam = jnp.broadcast_to(p["mean_cam"][None], (B, 3))

    for _ in range(cfg.ief_iters):
        if cfg.transformer_input == "mean_shape":
            tok_in = jnp.concatenate([pose, betas, cam],
                                     axis=-1)[:, None, :]
        else:
            tok_in = jnp.zeros((B, 1, 1), ctx.dtype)
        token = L.linear(p["token_embed"], tok_in.astype(ctx.dtype))
        token = token + p["pos_embed"].astype(token.dtype)[None]
        for blk in p["layers"]:
            y = L.layer_norm(blk["ln1"], token)
            token = token + _head_attn(y, None, blk["qkv"], None,
                                       blk["attn_out"], cfg.head_heads,
                                       cfg.head_dim_head)
            y = L.layer_norm(blk["ln2"], token)
            token = token + _head_attn(y, ctx, blk["to_q"], blk["to_kv"],
                                       blk["cross_out"], cfg.head_heads,
                                       cfg.head_dim_head)
            y = L.layer_norm(blk["ln3"], token)
            h = jax.nn.gelu(L.linear(blk["fc1"], y).astype(jnp.float32),
                            approximate=False).astype(y.dtype)
            token = token + L.linear(blk["fc2"], h)
        feat = token[:, 0].astype(jnp.float32)   # no final norm (reference)
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
