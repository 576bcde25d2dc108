"""ViTPose top-down 2D wholebody pose: ViT backbone + deconv heatmap head.

Reference: video_decomp/third-party/ViTPose config
ViTPose_huge_wholebody_256x192.py:28-56 — TopDown(ViT-huge 1280d/32L,
patch 16, input 256x192) + TopdownHeatmapSimpleHead (2× deconv(256, k4 s2)
→ 1x1 conv → 133 COCO-wholebody heatmaps), flip_test=True. Used to
(a) validate full-body visibility and (b) derive hand boxes from keypoints
(video_decomp/run.py:575-612, vitpose_model.py:17-87).

The 134k-LoC mmpose fork reduces to this file: backbone forward, heatmap
head, and the standard top-down keypoint decode (argmax + quarter-pixel
offset), batched over person crops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp.vit import ViTConfig, vit_init, vit_apply, tokens_to_grid
from mimo_tpu.models import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class ViTPoseConfig:
    backbone: ViTConfig = field(default_factory=lambda: ViTConfig(
        img_size=(256, 192), patch_size=16, dim=1280, depth=32,
        num_heads=16, use_cls_token=False, patch_padding=4,
        cls_pos_to_all=True))
    num_keypoints: int = 133
    deconv_channels: int = 256
    num_deconv: int = 2
    flip_test: bool = True      # ViTPose_huge_wholebody_256x192.py:28-56


def tiny_vitpose_config() -> ViTPoseConfig:
    return ViTPoseConfig(
        backbone=ViTConfig(img_size=(64, 48), patch_size=16, dim=32,
                           depth=2, num_heads=4, use_cls_token=False,
                           patch_padding=4, cls_pos_to_all=True),
        num_keypoints=7, deconv_channels=16)


def _deconv_init(key, c_in: int, c_out: int) -> Params:
    bound = 1.0 / np.sqrt(c_in * 16)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (4, 4, c_in, c_out),
                                     minval=-bound, maxval=bound),
        "bias": jnp.zeros((c_out,)),
    }


def _deconv_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(k=4, s=2, p=1) equivalent: output 2x spatial."""
    # torch ConvTranspose2d(k=4, s=2, p=1) output (2n) == JAX "SAME"
    y = jax.lax.conv_transpose(
        x, p["kernel"].astype(x.dtype), strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(y.dtype)


def vitpose_init(key, cfg: ViTPoseConfig) -> Params:
    keys = jax.random.split(key, cfg.num_deconv + 2)
    p: Params = {"backbone": vit_init(keys[0], cfg.backbone)}
    c_in = cfg.backbone.dim
    deconvs = []
    for i in range(cfg.num_deconv):
        deconvs.append({
            "deconv": _deconv_init(keys[1 + i], c_in, cfg.deconv_channels),
            "bn_scale": jnp.ones((cfg.deconv_channels,)),
            "bn_bias": jnp.zeros((cfg.deconv_channels,)),
            "bn_mean": jnp.zeros((cfg.deconv_channels,)),
            "bn_var": jnp.ones((cfg.deconv_channels,)),
        })
        c_in = cfg.deconv_channels
    p["deconvs"] = deconvs
    p["final"] = L.conv2d_init(keys[-1], 1, 1, c_in, cfg.num_keypoints)
    return p


def _bn(blk: Params, x: jnp.ndarray) -> jnp.ndarray:
    inv = jax.lax.rsqrt(blk["bn_var"].astype(jnp.float32) + 1e-5)
    y = (x.astype(jnp.float32) - blk["bn_mean"]) * inv
    y = y * blk["bn_scale"] + blk["bn_bias"]
    return y.astype(x.dtype)


def heatmaps(p: Params, cfg: ViTPoseConfig,
             crops: jnp.ndarray) -> jnp.ndarray:
    """crops: (B, 256, 192, 3) ImageNet-normalized person crops ->
    (B, 64, 48, K) heatmaps."""
    b, H, W, _ = crops.shape
    ps = cfg.backbone.patch_size
    pp = cfg.backbone.patch_padding
    gh = (H + 2 * pp - ps) // ps + 1 if pp else H // ps
    gw = (W + 2 * pp - ps) // ps + 1 if pp else W // ps
    tokens = vit_apply(p["backbone"], cfg.backbone, crops)
    x = tokens_to_grid(tokens, cfg.backbone, gh, gw)
    for blk in p["deconvs"]:
        x = _deconv_apply(blk["deconv"], x)
        x = jax.nn.relu(_bn(blk, x))
    return L.conv2d(p["final"], x, padding=0)


# COCO-wholebody mirrored keypoint pairs (derived from the `swap` fields in
# ViTPose configs/_base_/datasets/coco_wholebody.py): body 8, feet 3,
# face 29, hands 21.
COCO_WHOLEBODY_FLIP_PAIRS = [
    (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16),
    (17, 20), (18, 21), (19, 22),
    (23, 39), (24, 38), (25, 37), (26, 36), (27, 35), (28, 34), (29, 33),
    (30, 32), (40, 49), (41, 48), (42, 47), (43, 46), (44, 45), (54, 58),
    (55, 57), (59, 68), (60, 67), (61, 66), (62, 65), (63, 70), (64, 69),
    (71, 77), (72, 76), (73, 75), (78, 82), (79, 81), (83, 87), (84, 86),
    (88, 90),
    (91, 112), (92, 113), (93, 114), (94, 115), (95, 116), (96, 117),
    (97, 118), (98, 119), (99, 120), (100, 121), (101, 122), (102, 123),
    (103, 124), (104, 125), (105, 126), (106, 127), (107, 128), (108, 129),
    (109, 130), (110, 131), (111, 132),
]


def _flip_perm(num_keypoints: int, flip_pairs) -> np.ndarray:
    perm = np.arange(num_keypoints)
    for a, b in flip_pairs:
        perm[a], perm[b] = b, a
    return perm


def heatmaps_flip_test(p: Params, cfg: ViTPoseConfig, crops: jnp.ndarray,
                       flip_pairs=None) -> jnp.ndarray:
    """Flip-test heatmap averaging (mmpose TopDown.forward_test with the
    runtime config's flip_test=True, shift_heatmap=True —
    ViTPose_huge_wholebody_256x192.py:55-58):
    run the horizontally-flipped crop, swap mirrored keypoint channels and
    un-flip (post_transforms.py:110-148 flip_back), shift the flipped
    heatmap one pixel right (topdown_heatmap_simple_head.py:222-224), then
    average with the direct heatmap.

    Direct and flipped crops ride ONE doubled batch through the backbone
    (per-sample math is independent, so numerics match two separate calls):
    one ViT program of 2B fills the MXU where two B-sized programs each
    paid dispatch + half-empty batches — at B=1 through the 35 ms axon
    tunnel the split form was the round-4 pose-stage bottleneck."""
    if flip_pairs is None:
        flip_pairs = [pr for pr in COCO_WHOLEBODY_FLIP_PAIRS
                      if pr[1] < cfg.num_keypoints]
    if not cfg.flip_test:
        return heatmaps(p, cfg, crops)
    b = crops.shape[0]
    hm2 = heatmaps(p, cfg,
                   jnp.concatenate([crops, crops[:, :, ::-1]], axis=0))
    hm, hm_f = hm2[:b], hm2[b:]
    perm = _flip_perm(cfg.num_keypoints, flip_pairs)
    hm_f = hm_f[..., perm][:, :, ::-1]           # swap pairs, un-flip W
    # shift_heatmap: duplicate column 0, drop the last (NKHW [..., 1:] =
    # [..., :-1] in channels-last W terms)
    hm_f = jnp.concatenate([hm_f[:, :, :1], hm_f[:, :, :-1]], axis=2)
    return (hm + hm_f) * 0.5


def decode_keypoints(hm: np.ndarray, boxes_xywh: np.ndarray):
    """Standard top-down decode: per-keypoint argmax + 0.25px offset toward
    the second-highest neighbor, mapped back to image coords.

    hm: (B, h, w, K); boxes_xywh: (B, 4) crop boxes in the original image.
    Returns (B, K, 3) [x, y, score].
    """
    b, hh, ww, k = hm.shape
    flat = hm.reshape(b, hh * ww, k)
    idx = flat.argmax(axis=1)                            # (B, K)
    scores = np.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0]
    ys, xs = np.unravel_index(idx, (hh, ww))             # (B, K)

    # quarter-pixel refinement
    xs_f = xs.astype(np.float64)
    ys_f = ys.astype(np.float64)
    for bi in range(b):
        for ki in range(k):
            x, y = xs[bi, ki], ys[bi, ki]
            if 0 < x < ww - 1:
                diff = hm[bi, y, x + 1, ki] - hm[bi, y, x - 1, ki]
                xs_f[bi, ki] += 0.25 * np.sign(diff)
            if 0 < y < hh - 1:
                diff = hm[bi, y + 1, x, ki] - hm[bi, y - 1, x, ki]
                ys_f[bi, ki] += 0.25 * np.sign(diff)

    out = np.zeros((b, k, 3))
    for bi in range(b):
        bx, by, bw, bh = boxes_xywh[bi]
        out[bi, :, 0] = bx + (xs_f[bi] + 0.5) * bw / ww
        out[bi, :, 1] = by + (ys_f[bi] + 0.5) * bh / hh
        out[bi, :, 2] = scores[bi]
    return out


def hand_boxes_from_keypoints(kpts: np.ndarray, score_thr: float = 0.5,
                              pad: float = 1.2):
    """COCO-wholebody layout: left hand = kpts[-42:-21], right = kpts[-21:]
    (reference run.py:586-612). Returns (left_box, right_box) as xyxy or
    None when too few confident keypoints."""
    def box(sub):
        ok = sub[:, 2] > score_thr
        if ok.sum() < 3:
            return None
        xs, ys = sub[ok, 0], sub[ok, 1]
        cx, cy = xs.mean(), ys.mean()
        half = max(xs.max() - xs.min(), ys.max() - ys.min()) * pad / 2
        return np.array([cx - half, cy - half, cx + half, cy + half])

    return box(kpts[-42:-21]), box(kpts[-21:])
