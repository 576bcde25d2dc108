"""Configurable ViT encoder for the perception model zoo.

One implementation covers the backbones the decomposition stack needs
(SURVEY.md §2c):
- SAM1 image encoder: windowed attention + decomposed relative position
  bias, no cls token, conv neck (sam_automask/segment_anything/modeling/
  image_encoder.py:17-363)
- ViTPose-huge / HMR2 / HaMeR ViT backbones: plain global attention,
  learned pos embed (third-party/ViTPose config ViT-huge; hmr2/models/
  backbones/vit.py:211)
- DINOv2 (DepthAnythingV2 encoder): cls token, LayerScale
  (depth_anything_v2/dinov2.py:44)

Channels-last tokens; frames/crops batch in the leading axis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from mimo_tpu.models import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class ViTConfig:
    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    in_channels: int = 3
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    use_cls_token: bool = False
    layer_scale: bool = False          # DINOv2
    window_size: int = 0               # SAM: windowed attn except globals
    global_blocks: Tuple[int, ...] = ()  # blocks with global attn (SAM)
    use_rel_pos: bool = False          # SAM decomposed rel-pos bias
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    # ViTPose/HMR2 backbone quirks (third-party/ViTPose vit.py:157,320):
    # patch conv padding=4, and a cls-slot pos embed added to ALL tokens
    patch_padding: int = 0
    cls_pos_to_all: bool = False

    @property
    def grid(self) -> Tuple[int, int]:
        if self.patch_padding:
            return (
                (self.img_size[0] + 2 * self.patch_padding
                 - self.patch_size) // self.patch_size + 1,
                (self.img_size[1] + 2 * self.patch_padding
                 - self.patch_size) // self.patch_size + 1)
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)


def _block_init(key, cfg: ViTConfig, windowed: bool) -> Params:
    k = jax.random.split(key, 8)
    d = cfg.dim
    hidden = int(d * cfg.mlp_ratio)
    p = {
        "ln1": L.layer_norm_init(d),
        "qkv": L.linear_init(k[0], d, 3 * d, bias=cfg.qkv_bias),
        "proj": L.linear_init(k[1], d, d),
        "ln2": L.layer_norm_init(d),
        "fc1": L.linear_init(k[2], d, hidden),
        "fc2": L.linear_init(k[3], hidden, d),
    }
    if cfg.layer_scale:
        p["ls1"] = jnp.full((d,), 1e-5)
        p["ls2"] = jnp.full((d,), 1e-5)
    if cfg.use_rel_pos:
        hdim = d // cfg.num_heads
        if windowed and cfg.window_size:
            size = cfg.window_size
        else:
            size = max(cfg.grid)
        p["rel_pos_h"] = jnp.zeros((2 * size - 1, hdim))
        p["rel_pos_w"] = jnp.zeros((2 * size - 1, hdim))
    return p


def vit_init(key, cfg: ViTConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 4)
    gh, gw = cfg.grid
    n_tokens = gh * gw + (1 if (cfg.use_cls_token or cfg.cls_pos_to_all)
                          else 0)
    p: Params = {
        "patch_embed": L.conv2d_init(keys[0], cfg.patch_size, cfg.patch_size,
                                     cfg.in_channels, cfg.dim),
        "pos_embed": jax.random.normal(keys[1], (n_tokens, cfg.dim)) * 0.02,
        "blocks": [
            _block_init(keys[2 + i], cfg,
                        windowed=(cfg.window_size > 0
                                  and i not in cfg.global_blocks))
            for i in range(cfg.depth)
        ],
        "ln_out": L.layer_norm_init(cfg.dim),
    }
    if cfg.use_cls_token:
        p["cls_token"] = jnp.zeros((cfg.dim,))
    return p


def _interp_pos_embed(pos: jnp.ndarray, cfg: ViTConfig, gh: int,
                      gw: int) -> jnp.ndarray:
    """Bilinear-interpolate the grid part of a learned pos embed to a new
    grid (DINOv2 interpolate_pos_encoding; also lets SAM/ViTPose run at
    non-native resolutions)."""
    n_extra = 1 if cfg.use_cls_token else 0
    n_grid = pos.shape[0] - n_extra
    if n_grid == gh * gw:
        return pos
    g0h, g0w = cfg.grid
    grid = pos[n_extra:].reshape(g0h, g0w, -1)
    grid = jax.image.resize(grid, (gh, gw, grid.shape[-1]),
                            method="bilinear")
    grid = grid.reshape(gh * gw, -1)
    if n_extra:
        return jnp.concatenate([pos[:n_extra], grid], axis=0)
    return grid


# ---------------------------------------------------------------------------
# attention with optional windows + SAM decomposed rel-pos
# ---------------------------------------------------------------------------


def _rel_pos_bias(rel_h: jnp.ndarray, rel_w: jnp.ndarray, q: jnp.ndarray,
                  hgt: int, wid: int) -> jnp.ndarray:
    """SAM decomposed relative positional bias (image_encoder.py:243-363).

    q: (B, heads, H*W, d). Returns bias (B, heads, H*W, H*W)."""
    def select(rel, n):
        # relative coords for query i, key j: i - j + (n-1)
        coords = (jnp.arange(n)[:, None] - jnp.arange(n)[None, :]) + (n - 1)
        return rel[coords]                       # (n, n, d)

    Rh = select(rel_h, hgt)
    Rw = select(rel_w, wid)
    b, heads, _, d = q.shape
    qr = q.reshape(b, heads, hgt, wid, d)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, Rh)   # (B,hd,H,W,H)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, Rw)   # (B,hd,H,W,W)
    bias = (bias_h[..., :, None] + bias_w[..., None, :])
    return bias.reshape(b, heads, hgt * wid, hgt * wid)


def _attn(p: Params, x: jnp.ndarray, heads: int, hgt: int,
          wid: int) -> jnp.ndarray:
    """x: (B, S, D) where S == hgt*wid (+0; rel-pos requires no cls)."""
    b, s, d = x.shape
    qkv = L.linear(p["qkv"], x).reshape(b, s, 3, heads, d // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if "rel_pos_h" in p:
        qh = q.transpose(0, 2, 1, 3)             # (B, heads, S, hd)
        bias = _rel_pos_bias(p["rel_pos_h"].astype(x.dtype),
                             p["rel_pos_w"].astype(x.dtype), qh, hgt, wid)
        o = jax.nn.dot_product_attention(q, k, v, bias=bias)
    else:
        o = jax.nn.dot_product_attention(q, k, v)
    return L.linear(p["proj"], o.reshape(b, s, d))


def _window_partition(x: jnp.ndarray, hgt: int, wid: int, ws: int):
    """(B, H*W, D) -> (B*nW, ws*ws, D) with zero padding."""
    b, _, d = x.shape
    x = x.reshape(b, hgt, wid, d)
    ph, pw = (-hgt) % ws, (-wid) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = hgt + ph, wid + pw
    x = x.reshape(b, Hp // ws, ws, Wp // ws, ws, d)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, d)
    return x, (Hp, Wp)


def _window_unpartition(x: jnp.ndarray, b: int, hgt: int, wid: int, ws: int,
                        padded: Tuple[int, int]) -> jnp.ndarray:
    Hp, Wp = padded
    d = x.shape[-1]
    x = x.reshape(b, Hp // ws, Wp // ws, ws, ws, d)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, Hp, Wp, d)
    return x[:, :hgt, :wid].reshape(b, hgt * wid, d)


def vit_apply(p: Params, cfg: ViTConfig, pixels: jnp.ndarray,
              return_intermediates: Optional[List[int]] = None):
    """pixels: (B, H, W, C) -> tokens (B, S, D) after final LN.

    If return_intermediates is given, also returns the listed block outputs
    (pre-final-LN) — the DPT head consumes several levels.
    """
    b = pixels.shape[0]
    h = L.conv2d(p["patch_embed"], pixels, stride=cfg.patch_size,
                 padding=cfg.patch_padding)
    gh, gw = h.shape[1], h.shape[2]
    tokens = h.reshape(b, gh * gw, cfg.dim)
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(p["cls_token"].astype(tokens.dtype)[None, None],
                               (b, 1, cfg.dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
    if cfg.cls_pos_to_all:
        # x + pos_embed[:, 1:] + pos_embed[:, :1] (ViTPose vit.py:320)
        pos = p["pos_embed"].astype(tokens.dtype)
        tokens = tokens + pos[None, 1:] + pos[None, :1]
    else:
        tokens = tokens + _interp_pos_embed(p["pos_embed"], cfg, gh, gw
                                            ).astype(tokens.dtype)[None]

    inter = []
    for i, blk in enumerate(p["blocks"]):
        y = L.layer_norm(blk["ln1"], tokens, cfg.ln_eps)
        windowed = (cfg.window_size > 0 and i not in cfg.global_blocks
                    and not cfg.use_cls_token)
        if windowed:
            yw, padded = _window_partition(y, gh, gw, cfg.window_size)
            aw = _attn(blk, yw, cfg.num_heads, cfg.window_size,
                       cfg.window_size)
            a = _window_unpartition(aw, b, gh, gw, cfg.window_size, padded)
        elif cfg.use_cls_token:
            a = _attn_plain(blk, y, cfg.num_heads)
        else:
            a = _attn(blk, y, cfg.num_heads, gh, gw)
        if "ls1" in blk:
            a = a * blk["ls1"].astype(a.dtype)
        tokens = tokens + a

        y = L.layer_norm(blk["ln2"], tokens, cfg.ln_eps)
        m = L.linear(blk["fc2"], jax.nn.gelu(
            L.linear(blk["fc1"], y).astype(jnp.float32),
            approximate=False).astype(y.dtype))
        if "ls2" in blk:
            m = m * blk["ls2"].astype(m.dtype)
        tokens = tokens + m
        if return_intermediates is not None and i in return_intermediates:
            inter.append(tokens)

    out = L.layer_norm(p["ln_out"], tokens, cfg.ln_eps)
    if return_intermediates is not None:
        return out, inter
    return out


def _attn_plain(p: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    if s >= 1024:
        # Long unbiased sequences (DepthAnything's DINOv2-L at 518^2:
        # S=1370) ride the same flash dispatch as the UNet — XLA's plain
        # path materializes the score matrix; the dispatcher pads ragged
        # S to a lane multiple with SegmentIds masking (exact), and on
        # CPU/short-S falls back to jax.nn.dot_product_attention
        # (VERDICT r4 #5; reference: depth_anything_v2/dinov2.py:44).
        from mimo_tpu.ops.attention import dispatch_sdpa
        qkv = L.linear(p["qkv"], x)
        q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
        return L.linear(p["proj"], dispatch_sdpa(q, k, v, heads))
    qkv = L.linear(p["qkv"], x).reshape(b, s, 3, heads, d // heads)
    o = jax.nn.dot_product_attention(qkv[:, :, 0], qkv[:, :, 1],
                                     qkv[:, :, 2])
    return L.linear(p["proj"], o.reshape(b, s, d))


def tokens_to_grid(tokens: jnp.ndarray, cfg: ViTConfig,
                   gh: int, gw: int) -> jnp.ndarray:
    """Drop cls (if any) and reshape (B, S, D) -> (B, gh, gw, D)."""
    if cfg.use_cls_token:
        tokens = tokens[:, 1:]
    b, s, d = tokens.shape
    return tokens.reshape(b, gh, gw, d)
