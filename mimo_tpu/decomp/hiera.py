"""Hiera hierarchical ViT backbone + FPN neck (SAM2's image encoder).

Reference: video_decomp/segment-anything-2-main/sam2/modeling/backbones/
hieradet.py:36-171 (`MultiScaleAttention` with query pooling,
`MultiScaleBlock` with windowed attention and stage transitions, `Hiera`)
and `FpnNeck`/`ImageEncoder` (modeling/backbones/image_encoder.py:14-131).
Config for hiera-large (sam2_configs/sam2_hiera_l.yaml): embed_dim 144,
heads 2, stages (2, 6, 36, 4), window spec (8, 4, 16, 8), global attention
blocks (23, 33, 43), dim and heads double per stage, 2x2 query pooling at
each stage transition, FPN d_model 256 with top-down fusion only at levels
2 and 3 (nearest interp) and scalp=1 (the stride-32 level is dropped).

Exactness notes (hieradet.py):
- window size LAGS the stage by one block: the pooling block (first of a
  new stage) uses the PREVIOUS stage's window spec ("lags by a block",
  hieradet.py:232-236);
- pos embed = bicubic-interpolated 7x7 background + tiled first-stage
  window embed (hieradet.py:273-281 `_get_pos_embed`);
- shortcut at dim changes = maxpool(proj(norm1(x))) (hieradet.py:140-145);
- the FPN neck has NO norms, just per-level 1x1 convs + top-down sums
  (image_encoder.py:70-131).

Channels-last; windows partition exactly as in decomp/vit.py (bottom/right
zero padding, matching backbones/utils.py window_partition).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp.vit import _window_partition, _window_unpartition
from mimo_tpu.models import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 144
    num_heads: int = 2
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    window_spec: Tuple[int, ...] = (8, 4, 16, 8)
    global_blocks: Tuple[int, ...] = (23, 33, 43)
    input_size: Tuple[int, int] = (1024, 1024)
    pos_bkg_size: int = 7
    mlp_ratio: float = 4.0
    neck_dim: int = 256
    ln_eps: float = 1e-6

    @property
    def depth(self) -> int:
        return sum(self.stages)

    def stage_of(self, block_idx: int) -> int:
        acc = 0
        for s, n in enumerate(self.stages):
            acc += n
            if block_idx < acc:
                return s
        return len(self.stages) - 1

    def block_plan(self):
        """Per-block (dim_in, dim_out, heads, window, q_pool) plan.

        The window spec lags the stage transition by one block: the pooling
        block keeps the previous stage's window size (hieradet.py:232-236
        computes window_size before cur_stage increments).
        """
        plan = []
        dim = self.embed_dim
        heads = self.num_heads
        boundaries = set()
        acc = 0
        for n in self.stages[:-1]:
            acc += n
            boundaries.add(acc)  # first block of the NEXT stage pools
        for i in range(self.depth):
            stage = self.stage_of(i)
            if i in boundaries:
                # lagged window: previous stage's spec
                window = 0 if i in self.global_blocks \
                    else self.window_spec[stage - 1]
                plan.append((dim, dim * 2, heads * 2, window, True))
                dim *= 2
                heads *= 2
            else:
                window = 0 if i in self.global_blocks \
                    else self.window_spec[stage]
                plan.append((dim, dim, heads, window, False))
        return plan


def tiny_hiera_config() -> HieraConfig:
    return HieraConfig(embed_dim=16, num_heads=2, stages=(1, 1, 1, 1),
                       window_spec=(2, 2, 2, 2), global_blocks=(3,),
                       input_size=(64, 64), neck_dim=32)


def hiera_init(key, cfg: HieraConfig) -> Params:
    keys = iter(jax.random.split(key, 16 + 8 * cfg.depth
                                 + 2 * len(cfg.stages)))
    d0 = cfg.embed_dim
    blocks = []
    for (din, dout, heads, window, q_pool) in cfg.block_plan():
        blk = {
            "ln1": L.layer_norm_init(din),
            "qkv": L.linear_init(next(keys), din, 3 * dout),
            "proj_attn": L.linear_init(next(keys), dout, dout),
            "ln2": L.layer_norm_init(dout),
            "fc1": L.linear_init(next(keys), dout,
                                 int(dout * cfg.mlp_ratio)),
            "fc2": L.linear_init(next(keys), int(dout * cfg.mlp_ratio),
                                 dout),
        }
        if din != dout:
            blk["proj"] = L.linear_init(next(keys), din, dout)
        blocks.append(blk)
    w0 = cfg.window_spec[0]
    return {
        "patch_embed": L.conv2d_init(next(keys), 7, 7, 3, d0),
        "pos_bkg": jax.random.normal(next(keys),
                                     (cfg.pos_bkg_size, cfg.pos_bkg_size,
                                      d0)) * 0.02,
        "pos_win": jax.random.normal(next(keys), (w0, w0, d0)) * 0.02,
        "blocks": blocks,
        # FPN neck 1x1 convs, CHECKPOINT ORDER: convs[0] takes the
        # highest-dim (deepest stage) feature (image_encoder.py:73-86,
        # backbone_channel_list [8d, 4d, 2d, d]).
        "neck": [L.conv2d_init(next(keys), 1, 1,
                               d0 * (2 ** (len(cfg.stages) - 1 - i)),
                               cfg.neck_dim)
                 for i in range(len(cfg.stages))],
    }


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, C) 2x2 max pooling."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _attn(blk: Params, x: jnp.ndarray, heads: int, dout: int,
          q_pool: bool, hgt: int, wid: int):
    """MultiScaleAttention (hieradet.py:36-83): qkv at dout, optional 2x2
    maxpool on q BEFORE attention. x: (B, H*W, din)."""
    b = x.shape[0]
    qkv = L.linear(blk["qkv"], x).reshape(b, hgt * wid, 3, dout)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    oh, ow = hgt, wid
    if q_pool:
        q = _maxpool2(q.reshape(b, hgt, wid, dout))
        oh, ow = q.shape[1], q.shape[2]
        q = q.reshape(b, oh * ow, dout)
    d = dout // heads
    if q.shape[1] >= 1024 and d % 8 == 0 and d <= 160:
        # SAM2's global-attention blocks (stage-3 grid 64x64 = 4096
        # tokens at the 1024^2 encode) ride the flash dispatch — same
        # rationale as decomp/vit.py::_attn_plain (VERDICT r4 #5;
        # reference: sam2/modeling/backbones/hieradet.py:37-86)
        from mimo_tpu.ops.attention import dispatch_sdpa
        o = dispatch_sdpa(q, k, v, heads)
    else:
        o = jax.nn.dot_product_attention(
            q.reshape(b, -1, heads, d), k.reshape(b, -1, heads, d),
            v.reshape(b, -1, heads, d))
        o = o.reshape(b, oh * ow, dout)
    return L.linear(blk["proj_attn"], o), oh, ow


def hiera_pos_embed(p: Params, cfg: HieraConfig, gh: int, gw: int):
    """Bicubic-interpolated background embed + tiled window embed
    (hieradet.py:273-281)."""
    pos = jax.image.resize(p["pos_bkg"], (gh, gw, cfg.embed_dim),
                           method="bicubic")
    w0 = p["pos_win"].shape[0]
    reps = (-(-gh // w0), -(-gw // w0))
    tiled = jnp.tile(p["pos_win"], (reps[0], reps[1], 1))[:gh, :gw]
    return pos + tiled


def hiera_apply(p: Params, cfg: HieraConfig, pixels: jnp.ndarray):
    """pixels: (B, S, S, 3) normalized. Returns the list of per-stage
    feature maps [(B, S/4, S/4, d0), ..., (B, S/32, S/32, 8*d0)]."""
    b = pixels.shape[0]
    h = L.conv2d(p["patch_embed"], pixels, stride=4, padding=3)
    gh, gw = h.shape[1], h.shape[2]
    h = h + hiera_pos_embed(p, cfg, gh, gw).astype(h.dtype)[None]

    outputs = []
    tokens = h.reshape(b, gh * gw, cfg.embed_dim)
    plan = cfg.block_plan()
    stage_last = set()
    acc = 0
    for n in cfg.stages:
        acc += n
        stage_last.add(acc - 1)

    for i, (blk, (din, dout, heads, window, q_pool)) in enumerate(
            zip(p["blocks"], plan)):
        y = L.layer_norm(blk["ln1"], tokens, cfg.ln_eps)
        if "proj" in blk:
            shortcut = L.linear(blk["proj"], y)
            if q_pool:
                shortcut = _maxpool2(
                    shortcut.reshape(b, gh, gw, dout))
                shortcut = shortcut.reshape(b, -1, dout)
        else:
            shortcut = tokens

        if window and not q_pool:
            yw, padded = _window_partition(y, gh, gw, window)
            aw, _, _ = _attn(blk, yw, heads, dout, False, window, window)
            a = _window_unpartition(aw, b, gh, gw, window, padded)
            oh, ow = gh, gw
        elif window and q_pool:
            # windowed block with query pooling: each window's queries pool
            # 2x2, so unpartition at window/2 onto the pooled grid
            # (hieradet.py MultiScaleBlock.forward q_stride handling)
            yw, (Hp, Wp) = _window_partition(y, gh, gw, window)
            aw, wh, ww = _attn(blk, yw, heads, dout, True, window, window)
            oh, ow = gh // 2, gw // 2
            a = _window_unpartition(aw, b, oh, ow, window // 2,
                                    (Hp // 2, Wp // 2))
        else:
            a, oh, ow = _attn(blk, y, heads, dout, q_pool, gh, gw)

        if q_pool:
            gh, gw = oh, ow
        tokens = shortcut + a
        y2 = L.layer_norm(blk["ln2"], tokens, cfg.ln_eps)
        m = L.linear(blk["fc2"], jax.nn.gelu(
            L.linear(blk["fc1"], y2).astype(jnp.float32),
            approximate=False).astype(y2.dtype))
        tokens = tokens + m

        if i in stage_last:
            outputs.append(tokens.reshape(b, gh, gw, dout))

    return outputs


def sine_pos_embed(gh: int, gw: int, dim: int,
                   temperature: float = 10000.0) -> np.ndarray:
    """PositionEmbeddingSine (position_encoding.py:16-112), normalized,
    scale 2*pi. Returns (gh, gw, dim) with [y-feats ; x-feats] channel
    order (the reference cat(pos_y, pos_x) before BCHW permute)."""
    npf = dim // 2
    scale = 2 * np.pi
    y = np.arange(1, gh + 1, dtype=np.float32)[:, None] \
        * np.ones((1, gw), np.float32)
    x = np.arange(1, gw + 1, dtype=np.float32)[None, :] \
        * np.ones((gh, 1), np.float32)
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(npf, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  axis=-1).reshape(gh, gw, npf)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  axis=-1).reshape(gh, gw, npf)
    return np.concatenate([py, px], axis=-1)


def hiera_neck(p: Params, cfg: HieraConfig,
               stage_feats: List[jnp.ndarray],
               scalp: int = 1) -> Tuple[List[jnp.ndarray],
                                        List[np.ndarray]]:
    """FpnNeck (image_encoder.py:44-131) with scalp (ImageEncoder:29-41).

    Lateral 1x1 convs per level; top-down nearest-x2 fusion only into
    levels 2 and 3 of the 4-level pyramid (fpn_top_down_levels [2, 3] in
    sam2_hiera_l.yaml — levels indexed high-res=0 .. low-res=3, so only
    the stride-32 -> stride-16 sum actually fires); scalp=1 drops the
    stride-32 output. Returns ([stride4, stride8, stride16] features at
    neck_dim, matching sine pos embeds).
    """
    n = len(stage_feats) - 1
    out: List[Any] = [None] * len(stage_feats)
    prev = None
    top_down_levels = (2, 3)
    for i in range(n, -1, -1):
        lateral = L.conv2d(p["neck"][n - i], stage_feats[i], padding=0)
        if i in top_down_levels and prev is not None:
            up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
            prev = lateral + up.astype(lateral.dtype)
        else:
            prev = lateral
        out[i] = prev
    if scalp:
        out = out[:-scalp]
    pos = [sine_pos_embed(f.shape[1], f.shape[2], cfg.neck_dim)
           for f in out]
    return out, pos


def encode_image_hiera(p: Params, cfg: HieraConfig,
                       pixels: jnp.ndarray) -> jnp.ndarray:
    """Stride-16 neck feature (B, S/16, S/16, neck_dim) — the level SAM2's
    decoder consumes for mask prediction."""
    feats = hiera_apply(p, cfg, pixels)
    necked, _ = hiera_neck(p, cfg, feats)
    return necked[2]
