"""SAM2-style video segmentation/tracking: image encoder + memory attention
+ memory encoder + mask decoder, with the video predictor state machine.

Reference: video_decomp/segment-anything-2-main/sam2/ (6.4k LoC used
subset): `SAM2Base` (modeling/sam2_base.py:22) with `forward_image` (:463),
`_prepare_memory_conditioned_features` (:493), `track_step` (:704); Hiera
backbone (modeling/backbones/hieradet.py:171); memory attention
(modeling/memory_attention.py:17,102); memory encoder MaskDownSampler/
CXBlock/Fuser (modeling/memory_encoder.py:17,62,120,138); video predictor
state machine init_state/add_new_points/propagate_in_video
(sam2_video_predictor.py:40,156,592) — with the reference's local mod that
init_state takes an in-memory frame list (sam2_video_predictor.py:48-60).

TPU-native restructuring:
- all frame encodings are ONE batched encoder call at init_state (the
  reference encodes lazily per frame);
- the sequential propagation is a `lax.scan` whose carry is a FIXED-SIZE
  rolling memory bank (num_mem slots) — the reference keeps a python dict
  of per-frame memories and gathers ≤7 recent + conditioning each step
  (sam2_base.py:493-600); a ring buffer is the static-shape equivalent;
- the SAM2 CUDA connected-components hole-filling post-step
  (sam2/csrc/connected_components.cu) is ops/connected_components
  (host/scipy or native C++).

Backbones: `backbone="hiera"` uses the SAM2-architecture Hiera encoder
(decomp/hiera.py — multi-scale attention, query pooling, FPN neck);
`backbone="vit"` is a lighter windowed-ViT alternative. Hiera weight
conversion from the published sam2.1 checkpoints is the remaining parity
step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp.vit import ViTConfig, vit_init, vit_apply, tokens_to_grid
from mimo_tpu.decomp import sam as S1
from mimo_tpu.models import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class SAM2Config:
    encoder: ViTConfig = field(default_factory=lambda: ViTConfig(
        img_size=(512, 512), patch_size=16, dim=768, depth=12, num_heads=12,
        window_size=14, global_blocks=(5, 11), use_rel_pos=True,
        ln_eps=1e-6))
    backbone: str = "vit"          # "vit" | "hiera" (SAM2's real backbone)
    hiera: Optional[Any] = None    # HieraConfig when backbone == "hiera"
    dim: int = 256                 # feature/prompt dim
    mem_dim: int = 64              # memory feature dim
    num_mem: int = 7               # rolling memory slots (recent frames)
    mem_layers: int = 4            # memory-attention transformer layers
    mem_heads: int = 8
    num_mask_tokens: int = 4


def tiny_sam2_config() -> SAM2Config:
    return SAM2Config(
        encoder=ViTConfig(img_size=(64, 64), patch_size=16, dim=32, depth=2,
                          num_heads=4, window_size=2, global_blocks=(1,),
                          use_rel_pos=True, ln_eps=1e-6),
        dim=32, mem_dim=16, num_mem=3, mem_layers=1, mem_heads=4)


def sam2_init(key, cfg: SAM2Config) -> Params:
    keys = iter(jax.random.split(key, 64))
    d = cfg.dim
    md = cfg.mem_dim
    # reuse the SAM1 decoder/prompt machinery at dim d
    s1cfg = S1.SAMConfig(encoder=cfg.encoder, prompt_dim=d,
                         num_mask_tokens=cfg.num_mask_tokens,
                         decoder_heads=cfg.mem_heads)
    s1 = S1.sam_init(next(keys), s1cfg)
    mem_layers = []
    for _ in range(cfg.mem_layers):
        mem_layers.append({
            "ln1": L.layer_norm_init(d),
            "self": L.mha_init(next(keys), d),
            "ln2": L.layer_norm_init(d),
            "cross": L.mha_init(next(keys), d, context_dim=md),
            "ln3": L.layer_norm_init(d),
            "ff": L.geglu_ff_init(next(keys), d),
        })
    p_extra: Params = {}
    if cfg.backbone == "hiera":
        from mimo_tpu.decomp.hiera import hiera_init
        p_extra["hiera"] = hiera_init(next(keys), cfg.hiera)
    return {
        **p_extra,
        "sam": s1,
        "sam_cfg": s1cfg,
        "mem_attn": mem_layers,
        # memory encoder: mask downsampler (stride-16 convs) + fuser
        "mask_down": [
            L.conv2d_init(next(keys), 3, 3, 1, md // 2),
            L.conv2d_init(next(keys), 3, 3, md // 2, md // 2),
            L.conv2d_init(next(keys), 3, 3, md // 2, md),
            L.conv2d_init(next(keys), 3, 3, md, md),
        ],
        "mem_proj": L.conv2d_init(next(keys), 1, 1, d, md),
        "mem_fuse": L.conv2d_init(next(keys), 3, 3, md, md),
        # num_mem rolling slots + 1 conditioning slot
        "mem_pos": jax.random.normal(next(keys),
                                     (cfg.num_mem + 1, md)) * 0.02,
    }


# ---------------------------------------------------------------------------
# components
# ---------------------------------------------------------------------------


def encode_frames(p: Params, cfg: SAM2Config,
                  frames: jnp.ndarray) -> jnp.ndarray:
    """frames: (T, S, S, 3) normalized -> (T, g, g, dim). One batched call
    (vs the reference's per-frame lazy encode)."""
    if cfg.backbone == "hiera":
        from mimo_tpu.decomp.hiera import encode_image_hiera
        return encode_image_hiera(p["hiera"], cfg.hiera, frames)
    return S1.encode_image(p["sam"], p["sam_cfg"], frames)


def memory_attention(p: Params, cfg: SAM2Config, feat: jnp.ndarray,
                     mem: jnp.ndarray, mem_valid: jnp.ndarray) -> jnp.ndarray:
    """Condition current-frame features on the memory bank
    (reference memory_attention.py:17-160 / sam2_base.py:493-600).

    feat: (g, g, d); mem: (M, gm, gm, md) rolling bank;
    mem_valid: (M,) 1/0 slot validity. Returns conditioned (g, g, d).
    """
    g = feat.shape[0]
    d = cfg.dim
    tokens = feat.reshape(1, g * g, d)
    M, gm = mem.shape[0], mem.shape[1]
    mem_tok = (mem + p["mem_pos"][:, None, None, :].astype(mem.dtype))
    mem_tok = mem_tok.reshape(1, M * gm * gm, cfg.mem_dim)
    # invalid slots contribute nothing: zero their keys/values via mask on V
    valid = jnp.repeat(mem_valid, gm * gm)[None, :, None]

    for blk in p["mem_attn"]:
        y = L.layer_norm(blk["ln1"], tokens)
        tokens = tokens + L.mha(blk["self"], y, None, cfg.mem_heads)
        y = L.layer_norm(blk["ln2"], tokens)
        cross = _masked_cross(blk["cross"], y, mem_tok, valid, cfg.mem_heads)
        tokens = tokens + cross
        y = L.layer_norm(blk["ln3"], tokens)
        tokens = tokens + L.geglu_ff(blk["ff"], y)
    return tokens.reshape(g, g, d)


def _masked_cross(p_attn, q, kv, valid, heads):
    qq = L.linear(p_attn["to_q"], q)
    kk = L.linear(p_attn["to_k"], kv)
    vv = L.linear(p_attn["to_v"], kv)
    b, sq, inner = qq.shape
    sk = kk.shape[1]
    dh = inner // heads
    bias = jnp.where(valid[:, None, :, 0] > 0, 0.0, -1e9)[:, None]  # (1,1,1,sk)
    o = jax.nn.dot_product_attention(
        qq.reshape(b, sq, heads, dh), kk.reshape(b, sk, heads, dh),
        vv.reshape(b, sk, heads, dh),
        bias=bias.astype(jnp.float32))
    return L.linear(p_attn["to_out"], o.reshape(b, sq, inner))


def encode_memory(p: Params, cfg: SAM2Config, feat: jnp.ndarray,
                  mask_logits: jnp.ndarray) -> jnp.ndarray:
    """Create a memory slot from features + predicted mask
    (memory_encoder.py:17-160): sigmoid mask downsampled to the feature
    grid, fused with projected features."""
    g = feat.shape[0]
    m = jax.nn.sigmoid(mask_logits)[..., None]            # (4g, 4g, 1)
    h = m[None]
    for i, conv in enumerate(p["mask_down"]):
        stride = 2 if i < 2 else 1
        h = jax.nn.gelu(L.conv2d(conv, h, stride=stride, padding=1),
                        approximate=False)
    f = L.conv2d(p["mem_proj"], feat[None], padding=0)
    fused = L.conv2d(p["mem_fuse"], h + f, padding=1)
    return fused[0]                                        # (g, g, md)


# ---------------------------------------------------------------------------
# video predictor
# ---------------------------------------------------------------------------


class SAM2VideoPredictor:
    """init_state / add_new_points / propagate_in_video
    (reference sam2_video_predictor.py:40,156,592)."""

    def __init__(self, params: Params, cfg: SAM2Config):
        self.p = params
        self.cfg = cfg
        self._feats = None
        self._orig = None
        self._cond: Optional[Tuple[int, jnp.ndarray]] = None

    def _input_size(self) -> int:
        if self.cfg.backbone == "hiera":
            return self.cfg.hiera.input_size[0]
        return self.cfg.encoder.img_size[0]

    def init_state(self, frames: List[np.ndarray]) -> None:
        """frames: list of (H, W, 3) uint8 RGB (in-memory, matching the
        reference's local modification)."""
        import cv2
        S = self._input_size()
        self._orig = frames[0].shape[:2]
        batch = np.stack([
            (cv2.resize(f, (S, S)).astype(np.float32) - S1.SAM_MEAN)
            / S1.SAM_STD for f in frames])
        self._feats = encode_frames(self.p, self.cfg, jnp.asarray(batch))
        self._cond = None

    def add_new_points(self, frame_idx: int, points: np.ndarray,
                       labels: np.ndarray) -> np.ndarray:
        """Prompt one frame; returns its mask at original resolution and
        stores the conditioning memory."""
        h, w = self._orig
        pts01 = np.asarray(points, np.float32) / [w, h]
        sparse = S1.encode_points(self.p["sam"],
                                  jnp.asarray(pts01[None]),
                                  jnp.asarray(np.asarray(labels)[None]))
        feat = self._feats[frame_idx]
        masks, iou = S1.decode_masks(self.p["sam"], self.p["sam_cfg"], feat,
                                     sparse)
        best = int(jnp.argmax(iou[0, 1:])) + 1
        logits = masks[0, best]
        mem = encode_memory(self.p, self.cfg, feat, logits)
        self._cond = (frame_idx, mem)
        return self._mask_to_orig(logits)

    def _mask_to_orig(self, logits: jnp.ndarray) -> np.ndarray:
        import cv2
        h, w = self._orig
        m = np.asarray(logits.astype(jnp.float32))
        return cv2.resize(m, (w, h)) > 0

    def propagate_in_video(self, start: int = 0,
                           reverse: bool = False) -> np.ndarray:
        """Track the prompted object through all frames with a rolling
        memory bank (lax.scan). Returns (T, H, W) bool masks."""
        assert self._cond is not None, "add_new_points first"
        cfg = self.cfg
        T = self._feats.shape[0]
        g = self._feats.shape[1]
        gm = g  # memory grid == feature grid
        cond_mem = self._cond[1]

        feats = self._feats
        order = jnp.arange(T - 1, -1, -1) if reverse else jnp.arange(T)

        def step(carry, t):
            bank, valid, ptr = carry
            feat = feats[t]
            # memory = conditioning slot (always) + rolling recent slots
            mem_all = jnp.concatenate([cond_mem[None], bank], axis=0)
            valid_all = jnp.concatenate([jnp.ones((1,)), valid])
            cond_feat = memory_attention(self.p, cfg, feat, mem_all,
                                         valid_all)
            empty = S1.encode_points(
                self.p["sam"], jnp.zeros((1, 1, 2)),
                jnp.full((1, 1), -1, jnp.int32))
            masks, iou = S1.decode_masks(self.p["sam"], self.p["sam_cfg"],
                                         cond_feat, empty)
            best = jnp.argmax(iou[0])
            logits = masks[0, best]
            mem = encode_memory(self.p, cfg, feat, logits)
            bank = bank.at[ptr].set(mem)
            valid = valid.at[ptr].set(1.0)
            ptr = (ptr + 1) % cfg.num_mem
            return (bank, valid, ptr), logits

        bank0 = jnp.zeros((cfg.num_mem, gm, gm, cfg.mem_dim))
        valid0 = jnp.zeros((cfg.num_mem,))
        (_, _, _), logits_seq = jax.lax.scan(step, (bank0, valid0, 0),
                                             order)
        if reverse:
            logits_seq = logits_seq[::-1]
        return np.stack([self._mask_to_orig(lg) for lg in logits_seq])


def track_object(params: Params, cfg: SAM2Config, frames: List[np.ndarray],
                 points: np.ndarray, labels: np.ndarray,
                 prompt_frame: int = 0) -> np.ndarray:
    """One-shot helper: init -> prompt -> propagate forward+backward and
    merge (demo_occ.py:405-504 tracks each occluder fwd+bwd and ORs)."""
    pred = SAM2VideoPredictor(params, cfg)
    pred.init_state(frames)
    pred.add_new_points(prompt_frame, points, labels)
    fwd = pred.propagate_in_video(reverse=False)
    bwd = pred.propagate_in_video(reverse=True)
    return fwd | bwd
