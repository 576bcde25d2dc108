"""SAM2 video segmentation/tracking — checkpoint-exact sam2.1 architecture.

Reference: video_decomp/segment-anything-2-main/sam2/ (6.4k LoC used
subset), built from sam2_configs/sam2_hiera_l.yaml:
- image encoder = Hiera trunk + FpnNeck + sine pos (decomp/hiera.py);
- memory attention = 4 pre-norm layers of RoPE self-attention + RoPE
  cross-attention into the memory bank + relu FF
  (modeling/memory_attention.py:18-168, RoPEAttention
  modeling/sam/transformer.py:289-360, axial rotary enc
  modeling/position_encoding.py:167-216);
- memory encoder = MaskDownSampler (4x stride-2 convs + LN + GELU) fused
  with projected pixel features through 2 ConvNeXt CXBlocks, projected to
  mem_dim 64 (modeling/memory_encoder.py:17-190);
- SAM prompt encoder + mask decoder at dim 256 with high-res skip features
  (conv_s0/conv_s1), object-score token/head, dynamic multimask-via-
  stability fallback (modeling/sam/mask_decoder.py:15-290,
  prompt_encoder.py:17-101);
- SAM2Base tracking semantics: directly_add_no_mem_embed on conditioning
  frames, memory bank of 1 conditioning + 6 recent frame memories with
  temporal position embeddings maskmem_tpos_enc, up to 16 object pointers
  (split into 4 mem_dim tokens each, excluded from RoPE), fixed no-object
  pointer gating by predicted object score, sigmoid(mask)*20-10 memory
  input (binarized on prompted frames)
  (modeling/sam2_base.py:493-806; build_sam.py:54-65 overrides);
- video predictor state machine init_state/add_new_points/
  propagate_in_video (sam2_video_predictor.py:40,156,592), with the
  reference's local mod that init_state takes an in-memory frame list.

TPU-native restructuring (semantics-preserving):
- all frame encodings are ONE batched Hiera call at init_state (the
  reference encodes lazily per frame);
- the sequential propagation is a `lax.scan` whose carry holds FIXED-SIZE
  rolling banks: 6 recent memories + 15 recent object pointers (ring
  buffers with validity masks) — the reference gathers the same sets from
  python dicts (sam2_base.py:516-640); invalid slots are masked out of the
  cross-attention with additive -inf bias, which is exact;
- hole-filling (fill_hole_area=8, build_sam.py:64) runs host-side after
  the scan via ops/connected_components (the reference applies it to the
  stored output masks, not to the memory path — track_step encodes memory
  from the unfilled masks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp.hiera import (HieraConfig, hiera_init, hiera_apply,
                                   hiera_neck, sine_pos_embed,
                                   tiny_hiera_config)
from mimo_tpu.decomp.sam import (_deconv_init, _deconv2x, _mlp3_init, _mlp3,
                                 _sam_attn_init, _twoway_block_init, _xattn,
                                 _pe_encode)
from mimo_tpu.models import layers as L

Params = Dict[str, Any]

NO_OBJ_SCORE = -1024.0  # sam2_base.py:19


@dataclass(frozen=True)
class SAM2Config:
    hiera: HieraConfig = field(default_factory=HieraConfig)  # hiera-large
    dim: int = 256                 # d_model / prompt dim
    mem_dim: int = 64
    num_maskmem: int = 7           # 1 conditioning + 6 recent
    mem_layers: int = 4
    mem_heads: int = 1             # RoPE attention heads (yaml num_heads: 1)
    mem_ff: int = 2048
    max_obj_ptrs: int = 16         # max_obj_ptrs_in_encoder
    num_mask_tokens: int = 4       # 1 single + 3 multimask
    decoder_heads: int = 8
    rope_theta: float = 10000.0
    sigmoid_scale_mem: float = 20.0
    sigmoid_bias_mem: float = -10.0
    stability_delta: float = 0.05
    stability_thresh: float = 0.98

    @property
    def image_size(self) -> int:
        return self.hiera.input_size[0]


def tiny_sam2_config() -> SAM2Config:
    return SAM2Config(hiera=tiny_hiera_config(), dim=32, mem_dim=16,
                      num_maskmem=3, mem_layers=1, mem_heads=1, mem_ff=64,
                      max_obj_ptrs=4, decoder_heads=4)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _rope_attn_init(key, d: int, kv_in: Optional[int] = None) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kv = kv_in if kv_in is not None else d
    return {
        "q": L.linear_init(k1, d, d),
        "k": L.linear_init(k2, kv, d),
        "v": L.linear_init(k3, kv, d),
        "out": L.linear_init(k4, d, d),
    }


def sam2_init(key, cfg: SAM2Config) -> Params:
    keys = iter(jax.random.split(key, 128))
    d = cfg.dim
    md = cfg.mem_dim

    mem_layers = []
    for _ in range(cfg.mem_layers):
        mem_layers.append({
            "norm1": L.layer_norm_init(d),
            "self": _rope_attn_init(next(keys), d),
            "norm2": L.layer_norm_init(d),
            "cross": _rope_attn_init(next(keys), d, kv_in=md),
            "norm3": L.layer_norm_init(d),
            "lin1": L.linear_init(next(keys), d, cfg.mem_ff),
            "lin2": L.linear_init(next(keys), cfg.mem_ff, d),
        })

    # MaskDownSampler (memory_encoder.py:17-58): exactly 4 stride-2 convs
    # (total stride 16, image -> stride-16 grid), channels x4 per layer
    # capped at d (1->4->16->64->256 for d=256), then a 1x1 conv to d
    mask_down, mask_down_ln = [], []
    c_in = 1
    for _ in range(4):
        c_out = min(c_in * 4, d)
        mask_down.append(L.conv2d_init(next(keys), 3, 3, c_in, c_out))
        mask_down_ln.append(L.layer_norm_init(c_out))
        c_in = c_out
    mask_down.append(L.conv2d_init(next(keys), 1, 1, c_in, d))

    def cxblock():
        # CXBlock (memory_encoder.py:61-120): depthwise 7x7 conv, LN,
        # pointwise linears 4x, layer scale gamma init 1e-6
        return {
            "dwconv": L.conv2d_init(next(keys), 7, 7, 1, d),  # depthwise
            "norm": L.layer_norm_init(d),
            "pw1": L.linear_init(next(keys), d, 4 * d),
            "pw2": L.linear_init(next(keys), 4 * d, d),
            "gamma": jnp.full((d,), 1e-6),
        }

    nm = cfg.num_mask_tokens
    return {
        "trunk": hiera_init(next(keys), cfg.hiera),
        "mem_attn": {
            "layers": mem_layers,
            "norm": L.layer_norm_init(d),
        },
        "mem_enc": {
            "mask_down": mask_down,
            "mask_down_ln": mask_down_ln,
            "pix_proj": L.conv2d_init(next(keys), 1, 1, d, d),
            "fuser": [cxblock(), cxblock()],
            "out_proj": L.conv2d_init(next(keys), 1, 1, d, md),
        },
        "maskmem_tpos_enc": jax.random.normal(
            next(keys), (cfg.num_maskmem, md)) * 0.02,
        "no_mem_embed": jax.random.normal(next(keys), (d,)) * 0.02,
        "no_mem_pos_enc": jax.random.normal(next(keys), (d,)) * 0.02,
        "no_obj_ptr": jax.random.normal(next(keys), (d,)) * 0.02,
        "obj_ptr_proj": _mlp3_init(next(keys), d, d, d),
        "prompt": {
            "pe_gaussian": jax.random.normal(next(keys), (2, d // 2)),
            "point_embed": jax.random.normal(next(keys), (4, d)) * 0.02,
            "not_a_point": jax.random.normal(next(keys), (d,)) * 0.02,
            "no_mask_embed": jax.random.normal(next(keys), (d,)) * 0.02,
            # mask_downscaling: 1 -> 4 -> 16 -> 256 (prompt_encoder.py:57-65)
            "mask_down": [L.conv2d_init(next(keys), 2, 2, 1, 4),
                          L.conv2d_init(next(keys), 2, 2, 4, 16),
                          L.conv2d_init(next(keys), 1, 1, 16, d)],
            "mask_down_ln": [L.layer_norm_init(4), L.layer_norm_init(16)],
        },
        "decoder": {
            "obj_token": jax.random.normal(next(keys), (d,)) * 0.02,
            "iou_token": jax.random.normal(next(keys), (d,)) * 0.02,
            "mask_tokens": jax.random.normal(next(keys), (nm, d)) * 0.02,
            "transformer": [
                _twoway_block_init(next(keys), d, cfg.decoder_heads)
                for _ in range(2)],
            "final_attn": _sam_attn_init(next(keys), d, d // 2),
            "final_ln": L.layer_norm_init(d),
            "up1": _deconv_init(next(keys), d, d // 4),
            "up_ln": L.layer_norm_init(d // 4),
            "up2": _deconv_init(next(keys), d // 4, d // 8),
            "conv_s0": L.conv2d_init(next(keys), 1, 1, d, d // 8),
            "conv_s1": L.conv2d_init(next(keys), 1, 1, d, d // 4),
            "mask_mlps": [_mlp3_init(next(keys), d, d, d // 8)
                          for _ in range(nm)],
            "iou_mlp": _mlp3_init(next(keys), d, d, nm),
            "obj_mlp": _mlp3_init(next(keys), d, d, 1),
        },
    }


# ---------------------------------------------------------------------------
# rotary position encoding (axial 2D)
# ---------------------------------------------------------------------------


def axial_rope_angles(head_dim: int, end_x: int, end_y: int,
                      theta: float = 10000.0) -> np.ndarray:
    """compute_axial_cis (position_encoding.py:174-183) as real angles:
    (end_x*end_y, head_dim//2) where the first head_dim//4 columns rotate
    by x-position frequencies and the rest by y-position frequencies."""
    n = head_dim // 4
    freqs = 1.0 / theta ** (np.arange(0, head_dim, 4)[:n].astype(np.float32)
                            / head_dim)
    t = np.arange(end_x * end_y, dtype=np.float32)
    tx, ty = t % end_x, np.floor(t / end_x)
    return np.concatenate([np.outer(tx, freqs), np.outer(ty, freqs)],
                          axis=-1)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray,
                sin: jnp.ndarray) -> jnp.ndarray:
    """x: (..., S, head_dim) viewed as head_dim//2 complex pairs
    (position_encoding.py:194-216 apply_rotary_enc)."""
    orig = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    yr = xr * cos - xi * sin
    yi = xr * sin + xi * cos
    return jnp.stack([yr, yi], axis=-1).reshape(x.shape).astype(orig)


def _rope_attention(p: Params, q_in: jnp.ndarray, k_in: jnp.ndarray,
                    v_in: jnp.ndarray, heads: int, cos: jnp.ndarray,
                    sin: jnp.ndarray, repeat_k: int = 1,
                    k_rope_len: Optional[int] = None,
                    bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """RoPEAttention.forward (sam/transformer.py:311-359): project, split
    heads, rotate q fully and k's first k_rope_len positions (freqs tiled
    repeat_k times for cross-attention into the memory), attend, merge.

    q_in: (B, Sq, d); k_in/v_in: (B, Sk, kv_in). bias: (B, 1, Sq, Sk) or
    broadcastable additive attention bias (used to mask invalid memory
    slots — exact, since exp(-inf)=0).

    Inputs are normalized to the param dtype first: f32 positional
    encodings or carry state otherwise promote one of q/k/v and the TPU
    attention paths reject mixed-dtype operands."""
    dt = p["q"]["kernel"].dtype
    q_in, k_in, v_in = (a.astype(dt) for a in (q_in, k_in, v_in))
    q = L.linear(p["q"], q_in)
    k = L.linear(p["k"], k_in)
    v = L.linear(p["v"], v_in)
    b, sq, inner = q.shape
    sk = k.shape[1]
    dh = inner // heads
    q = q.reshape(b, sq, heads, dh)
    k = k.reshape(b, sk, heads, dh)
    v = v.reshape(b, sk, heads, dh)

    # rotate (freqs broadcast over batch and heads; seq axis is -2 of
    # (..., S, dh) so move heads before seq)
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    qh = _apply_rope(qh, cos, sin)
    kr = k_rope_len if k_rope_len is not None else sk
    cos_k = jnp.tile(cos, (repeat_k, 1))
    sin_k = jnp.tile(sin, (repeat_k, 1))
    kh_rot = _apply_rope(kh[:, :, :kr], cos_k, sin_k)
    kh = jnp.concatenate([kh_rot, kh[:, :, kr:]], axis=2) if kr < sk \
        else kh_rot

    o = jax.nn.dot_product_attention(
        qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3), v,
        bias=None if bias is None else bias.astype(jnp.float32))
    return L.linear(p["out"], o.reshape(b, sq, inner))


# ---------------------------------------------------------------------------
# memory attention
# ---------------------------------------------------------------------------


def memory_attention(p: Params, cfg: SAM2Config, feat: jnp.ndarray,
                     feat_pos: jnp.ndarray, mem: jnp.ndarray,
                     mem_pos: jnp.ndarray, mem_valid: jnp.ndarray,
                     obj_ptr_tokens: jnp.ndarray,
                     ptr_valid: jnp.ndarray) -> jnp.ndarray:
    """MemoryAttention.forward (memory_attention.py:104-169).

    feat/feat_pos: (g, g, d) current-frame stride-16 features + sine pos;
    mem: (M, g, g, mem_dim) memory slots; mem_pos: same shape (sine pos +
    maskmem_tpos_enc already added); mem_valid: (M,);
    obj_ptr_tokens: (P, mem_dim) pointer tokens (pos enc is zero —
    add_tpos_enc_to_obj_ptrs=false in sam2_hiera_l.yaml); ptr_valid: (P,).
    Returns conditioned (g, g, d).
    """
    g = feat.shape[0]
    d = cfg.dim
    S = g * g
    M = mem.shape[0]
    md = cfg.mem_dim

    x = (feat + 0.1 * feat_pos).reshape(1, S, d)       # pos_enc_at_input
    # pointer tokens ride the f32 carry; cast to the memory dtype so the
    # concat does not promote the whole key/value set to f32 (mixed-dtype
    # q/k/v is rejected by the TPU attention paths)
    ptr = obj_ptr_tokens.astype(mem.dtype)
    memory = jnp.concatenate([mem.reshape(M * S, md), ptr],
                             axis=0)[None]
    memory_pos = jnp.concatenate(
        [mem_pos.reshape(M * S, md).astype(mem.dtype),
         jnp.zeros_like(ptr)], axis=0)[None]
    n_ptr = obj_ptr_tokens.shape[0]

    key_valid = jnp.concatenate(
        [jnp.repeat(mem_valid, S), ptr_valid], axis=0)
    bias = jnp.where(key_valid > 0, 0.0, -jnp.inf)[None, None, None, :]

    ang = axial_rope_angles(d // cfg.mem_heads, g, g, cfg.rope_theta)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))

    for blk in p["mem_attn"]["layers"]:
        # self-attention (pos_enc_at_attn=false: no pos added to q/k)
        t = L.layer_norm(blk["norm1"], x)
        x = x + _rope_attention(blk["self"], t, t, t, cfg.mem_heads,
                                cos, sin)
        # cross-attention into memory (pos added to keys only)
        t = L.layer_norm(blk["norm2"], x)
        x = x + _rope_attention(
            blk["cross"], t, memory + memory_pos, memory, cfg.mem_heads,
            cos, sin, repeat_k=M, k_rope_len=M * S, bias=bias)
        # FF (relu, memory_attention.py:96-99)
        t = L.layer_norm(blk["norm3"], x)
        x = x + L.linear(blk["lin2"], jax.nn.relu(L.linear(blk["lin1"], t)))

    x = L.layer_norm(p["mem_attn"]["norm"], x)
    return x.reshape(g, g, d)


# ---------------------------------------------------------------------------
# memory encoder
# ---------------------------------------------------------------------------


def encode_memory(p: Params, cfg: SAM2Config, feat: jnp.ndarray,
                  mask_for_mem: jnp.ndarray) -> jnp.ndarray:
    """MemoryEncoder.forward (memory_encoder.py:138-190).

    feat: (g, g, d) stride-16 features; mask_for_mem: (16g, 16g) mask
    probabilities ALREADY sigmoid-scaled (sam2_base.py:684-696 applies
    sigmoid*20-10, or binarization, before calling the encoder with
    skip_mask_sigmoid=True). Returns (g, g, mem_dim).
    """
    me = p["mem_enc"]
    h = mask_for_mem[None, ..., None]
    for conv, ln in zip(me["mask_down"][:-1], me["mask_down_ln"]):
        h = L.conv2d(conv, h, stride=2, padding=1)
        h = L.layer_norm(ln, h, 1e-6)
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=False).astype(h.dtype)
    h = L.conv2d(me["mask_down"][-1], h, padding=0)

    x = L.conv2d(me["pix_proj"], feat[None], padding=0)
    x = x + h
    for blk in me["fuser"]:
        y = L.conv2d(blk["dwconv"], x, padding=3, groups=x.shape[-1])
        y = L.layer_norm(blk["norm"], y, 1e-6)
        y = L.linear(blk["pw2"], jax.nn.gelu(
            L.linear(blk["pw1"], y).astype(jnp.float32),
            approximate=False).astype(y.dtype))
        x = x + y * blk["gamma"].astype(y.dtype)
    return L.conv2d(me["out_proj"], x, padding=0)[0]


# ---------------------------------------------------------------------------
# prompt encoder + mask decoder (SAM2 variants)
# ---------------------------------------------------------------------------


def encode_points(p: Params, cfg: SAM2Config, points_px: jnp.ndarray,
                  labels: jnp.ndarray) -> jnp.ndarray:
    """PromptEncoder._embed_points (prompt_encoder.py:79-101): +0.5 pixel
    shift, random-fourier PE of coords normalized by image_size, per-label
    embeddings. points_px: (B, N, 2) in model-input pixels; labels (B, N)
    in {-1 pad, 0 neg, 1 pos, 2/3 box corners}."""
    pr = p["prompt"]
    coords01 = (points_px + 0.5) / cfg.image_size
    pe = _pe_encode(pr, coords01.astype(jnp.float32))
    emb = pr["point_embed"].astype(pe.dtype)
    out = pe + jnp.where((labels == 0)[..., None], emb[0], 0)
    out = out + jnp.where((labels == 1)[..., None], emb[1], 0)
    out = out + jnp.where((labels == 2)[..., None], emb[2], 0)
    out = out + jnp.where((labels == 3)[..., None], emb[3], 0)
    out = jnp.where((labels == -1)[..., None],
                    pr["not_a_point"].astype(pe.dtype), out)
    return out


def _dense_pe(p: Params, g: int, dtype) -> jnp.ndarray:
    """get_dense_pe: random-fourier PE on the pixel-center grid."""
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(ys, ys, indexing="xy"), axis=-1)
    return _pe_encode(p["prompt"], grid).astype(dtype)


def decode_masks(p: Params, cfg: SAM2Config, feat: jnp.ndarray,
                 sparse: jnp.ndarray, feat_s0: jnp.ndarray,
                 feat_s1: jnp.ndarray,
                 dense: Optional[jnp.ndarray] = None):
    """MaskDecoder.predict_masks (mask_decoder.py:168-245) with
    pred_obj_scores and high-res skip features.

    feat: (g, g, d); sparse: (B, N, d); feat_s0: (4g, 4g, d//8) and
    feat_s1: (2g, 2g, d//4) ALREADY projected by conv_s0/conv_s1
    (precomputed at forward_image, sam2_base.py:467-475).
    Returns (masks (B, nm, 4g, 4g) — index 0 single-mask token, 1..3
    multimask tokens —, iou (B, nm), mask_tokens_out (B, nm, d),
    obj_logits (B, 1)).
    """
    dd = p["decoder"]
    g = feat.shape[0]
    d = cfg.dim
    nm = cfg.num_mask_tokens
    B = sparse.shape[0]

    tokens = jnp.concatenate([
        jnp.broadcast_to(dd["obj_token"].astype(sparse.dtype)[None, None],
                         (B, 1, d)),
        jnp.broadcast_to(dd["iou_token"].astype(sparse.dtype)[None, None],
                         (B, 1, d)),
        jnp.broadcast_to(dd["mask_tokens"].astype(sparse.dtype)[None],
                         (B, nm, d)),
        sparse,
    ], axis=1)

    if dense is None:
        dense = p["prompt"]["no_mask_embed"].astype(feat.dtype)
    src = (feat + dense).reshape(1, g * g, d)
    src = jnp.broadcast_to(src, (B, g * g, d))
    pos = _dense_pe(p, g, feat.dtype).reshape(1, g * g, d)
    pos = jnp.broadcast_to(pos, (B, g * g, d))

    # TwoWayTransformer (sam/transformer.py:44-137) — post-norm, PEs added
    # to q/k each layer, first block's self-attention skips the PE
    q = tokens
    token_pe = tokens
    for i, blk in enumerate(dd["transformer"]):
        if i == 0:
            q = _xattn(blk["self_attn"], q, q, q, cfg.decoder_heads)
        else:
            qq = q + token_pe
            q = q + _xattn(blk["self_attn"], qq, qq, q, cfg.decoder_heads)
        q = L.layer_norm(blk["ln1"], q)
        attn = _xattn(blk["t2i"], q + token_pe, src + pos, src,
                      cfg.decoder_heads)
        q = L.layer_norm(blk["ln2"], q + attn)
        m = L.linear(blk["mlp_fc2"],
                     jax.nn.relu(L.linear(blk["mlp_fc1"], q)))
        q = L.layer_norm(blk["ln3"], q + m)
        attn_i = _xattn(blk["i2t"], src + pos, q + token_pe, q,
                        cfg.decoder_heads)
        src = L.layer_norm(blk["ln4"], src + attn_i)

    q = q + _xattn(dd["final_attn"], q + token_pe, src + pos, src,
                   cfg.decoder_heads)
    q = L.layer_norm(dd["final_ln"], q)

    # upscaling with high-res skips (mask_decoder.py:222-228)
    img = src.reshape(B, g, g, d)
    up = _deconv2x(dd["up1"], img) + feat_s1[None].astype(img.dtype)
    up = jax.nn.gelu(
        L.layer_norm(dd["up_ln"], up, 1e-6).astype(jnp.float32),
        approximate=False).astype(up.dtype)  # LayerNorm2d eps 1e-6
    up = _deconv2x(dd["up2"], up) + feat_s0[None].astype(up.dtype)
    up = jax.nn.gelu(up.astype(jnp.float32),
                     approximate=False).astype(up.dtype)  # (B, 4g, 4g, d/8)

    mask_tokens_out = q[:, 2:2 + nm]
    mask_embeds = jnp.stack([
        _mlp3(dd["mask_mlps"][i], mask_tokens_out[:, i])
        for i in range(nm)], axis=1)                       # (B, nm, d/8)
    masks = jnp.einsum("bmc,bhwc->bmhw", mask_embeds, up)
    iou = _mlp3(dd["iou_mlp"], q[:, 1])                    # (B, nm)
    iou = jax.nn.sigmoid(iou)        # iou_prediction_use_sigmoid: True
    obj_logits = _mlp3(dd["obj_mlp"], q[:, 0])             # (B, 1)
    return masks, iou, mask_tokens_out, obj_logits


def _stability_scores(mask_logits: jnp.ndarray, delta: float) -> jnp.ndarray:
    """mask_decoder.py:247-258."""
    flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
    area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
    return jnp.where(area_u > 0, area_i / area_u, 1.0)


def forward_sam_heads(p: Params, cfg: SAM2Config, feat: jnp.ndarray,
                      feat_s0: jnp.ndarray, feat_s1: jnp.ndarray,
                      sparse: Optional[jnp.ndarray],
                      multimask_output: bool):
    """SAM2Base._forward_sam_heads (sam2_base.py:245-410): run decoder,
    select output mask (multimask: best IoU; single: dynamic multimask via
    stability, build_sam.py:57-59), gate by object score, produce the
    object pointer. Returns (low_res_mask (4g, 4g), high_res_mask
    (16g, 16g), obj_ptr (d,), obj_logits scalar)."""
    if sparse is None:
        # empty point with label -1 (sam2_base.py:310-313)
        sparse = encode_points(
            p, cfg, jnp.zeros((1, 1, 2)), jnp.full((1, 1), -1, jnp.int32))
    masks, ious, mask_tokens_out, obj_logits = decode_masks(
        p, cfg, feat, sparse, feat_s0, feat_s1)
    single_mask = masks[:, 0]
    multi_masks = masks[:, 1:]
    multi_ious = ious[:, 1:]

    is_obj = (obj_logits[0, 0] > 0)
    lam = is_obj.astype(jnp.float32)

    if multimask_output:
        best = jnp.argmax(multi_ious[0])
        low_res = multi_masks[0, best]
        sam_token = mask_tokens_out[0, 1 + best]   # multimask token
    else:
        # dynamic multimask via stability (mask_decoder.py:260-290)
        best = jnp.argmax(multi_ious[0])
        stab = _stability_scores(single_mask[0], cfg.stability_delta)
        stable = stab >= cfg.stability_thresh
        low_res = jnp.where(stable, single_mask[0], multi_masks[0, best])
        sam_token = mask_tokens_out[0, 0]          # always the single token

    # hard no-object gating of the mask (sam2_base.py:355-366)
    low_res = jnp.where(is_obj, low_res, NO_OBJ_SCORE).astype(jnp.float32)
    S = cfg.image_size
    high_res = jax.image.resize(low_res, (S, S), method="bilinear")

    obj_ptr = _mlp3(p["obj_ptr_proj"], sam_token)
    # fixed_no_obj_ptr + soft blend (sam2_base.py:389-400)
    obj_ptr = lam * obj_ptr + (1 - lam) * p["no_obj_ptr"].astype(
        obj_ptr.dtype)
    return low_res, high_res, obj_ptr, obj_logits[0, 0]


# ---------------------------------------------------------------------------
# image encoding (forward_image)
# ---------------------------------------------------------------------------


def encode_frames(p: Params, cfg: SAM2Config, frames: jnp.ndarray):
    """SAM2Base.forward_image (sam2_base.py:463-475): Hiera trunk + FPN
    neck; levels 0/1 pre-projected by the decoder's conv_s0/conv_s1.
    frames: (T, S, S, 3) normalized. Returns (feat16 (T, g, g, d),
    feat_s1 (T, 2g, 2g, d//4), feat_s0 (T, 4g, 4g, d//8),
    pos16 (g, g, d))."""
    stage_feats = hiera_apply(p["trunk"], cfg.hiera, frames)
    fpn, pos = hiera_neck(p["trunk"], cfg.hiera, stage_feats)
    s0 = L.conv2d(p["decoder"]["conv_s0"], fpn[0], padding=0)
    s1 = L.conv2d(p["decoder"]["conv_s1"], fpn[1], padding=0)
    return fpn[2], s1, s0, jnp.asarray(pos[2], fpn[2].dtype)


# ---------------------------------------------------------------------------
# video predictor
# ---------------------------------------------------------------------------

IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)


@partial(jax.jit, static_argnums=(0, 1))
def _prompt_forward(cfg: SAM2Config, multimask: bool, p: Params,
                    feat16_t, s0_t, s1_t, pts, lbl):
    """Prompt-frame forward (heads + conditioning memory) as one jitted
    program — the eager path paid per-op dispatch through the tunnel for
    every seed (sam2_base.py:263-360 semantics)."""
    feat = feat16_t + p["no_mem_embed"].astype(feat16_t.dtype)
    sparse = encode_points(p, cfg, pts, lbl)
    low_res, high_res, obj_ptr, _ = forward_sam_heads(
        p, cfg, feat, s0_t, s1_t, sparse, multimask_output=multimask)
    # conditioning memory: binarize_mask_from_pts_for_mem_enc=true
    # (build_sam.py:62) -> raw 0/1 mask, NO sigmoid, then scale*x+bias
    # (sam2_base.py:686-696)
    mask_for_mem = (high_res > 0).astype(jnp.float32) \
        * cfg.sigmoid_scale_mem + cfg.sigmoid_bias_mem
    mem = encode_memory(p, cfg, feat16_t, mask_for_mem)
    return low_res, mem, obj_ptr


@partial(jax.jit, static_argnums=0)
def _propagate_scan(cfg: SAM2Config, p: Params, feat16, s1, s0, pos16,
                    cond_mem, cond_ptr, order):
    """The tracking loop as ONE jitted lax.scan program.

    Module-level + jit (params as arguments) so repeated propagations —
    the occ stage tracks every occluder seed through the same clip —
    reuse the traced/compiled program per order length instead of
    retracing an eager scan whose closure constants (450 MB of SAM2
    weights) re-stage on every call. Reference loop:
    sam2_video_predictor.py:592-687 (one frame per Python iteration).
    """
    g = feat16.shape[1]
    R = cfg.num_maskmem - 1              # recent memory slots
    P = cfg.max_obj_ptrs - 1             # recent pointer slots
    md = cfg.mem_dim
    d = cfg.dim
    mem_spatial_pos = jnp.asarray(sine_pos_embed(g, g, md), jnp.float32)
    tpos = p["maskmem_tpos_enc"].astype(jnp.float32)

    def step(carry, t):
        bank, bank_valid, ptrs, ptr_valid, n_seen = carry
        feat = feat16[t]

        # memory slot ordering: ring index j holds the frame processed
        # (n_seen - j) steps ago... we store newest at slot
        # (n_seen-1) % R. Age of slot s = n_seen - 1 - s' where s'
        # counts writes; recover ages via write counter.
        write_idx = jnp.mod(n_seen, R)
        ages = jnp.mod(write_idx - 1 - jnp.arange(R), R) + 1
        # slots never written are invalid anyway
        slot_tpos = tpos[jnp.clip(ages - 1, 0, cfg.num_maskmem - 1)]

        mem_all = jnp.concatenate([cond_mem[None], bank], axis=0)
        pos_all = jnp.concatenate([
            (mem_spatial_pos + tpos[cfg.num_maskmem - 1])[None],
            mem_spatial_pos[None] + slot_tpos[:, None, None, :],
        ], axis=0).astype(mem_all.dtype)
        valid_all = jnp.concatenate([jnp.ones((1,)), bank_valid])

        # object pointers: cond + recent, each split into d//md tokens
        all_ptrs = jnp.concatenate([cond_ptr[None], ptrs], axis=0)
        split = d // md
        ptr_tokens = all_ptrs.reshape(-1, split, md).reshape(-1, md)
        ptr_tok_valid = jnp.repeat(
            jnp.concatenate([jnp.ones((1,)), ptr_valid]), split)

        cond_feat = memory_attention(
            p, cfg, feat, pos16, mem_all, pos_all, valid_all,
            ptr_tokens, ptr_tok_valid)

        low_res, high_res, obj_ptr, obj_logit = forward_sam_heads(
            p, cfg, cond_feat, s0[t], s1[t], None,
            multimask_output=True)  # tracking: 0 points -> multimask

        # encode new memory (sigmoid*20-10, sam2_base.py:689-696)
        mask_for_mem = jax.nn.sigmoid(high_res) \
            * cfg.sigmoid_scale_mem + cfg.sigmoid_bias_mem
        new_mem = encode_memory(p, cfg, feat, mask_for_mem)

        bank = jax.lax.dynamic_update_index_in_dim(
            bank, new_mem.astype(bank.dtype), write_idx, 0)
        bank_valid = bank_valid.at[write_idx].set(1.0)
        pwrite = jnp.mod(n_seen, P)
        ptrs = jax.lax.dynamic_update_index_in_dim(
            ptrs, obj_ptr.astype(ptrs.dtype), pwrite, 0)
        ptr_valid = ptr_valid.at[pwrite].set(1.0)
        return (bank, bank_valid, ptrs, ptr_valid, n_seen + 1), low_res

    bank0 = jnp.zeros((R, g, g, md), feat16.dtype)
    ptrs0 = jnp.zeros((P, d), jnp.float32)
    carry0 = (bank0, jnp.zeros((R,)), ptrs0, jnp.zeros((P,)),
              jnp.asarray(0, jnp.int32))
    _, logits_seq = jax.lax.scan(step, carry0, order)
    return logits_seq


class SAM2VideoPredictor:
    """init_state / add_new_points / propagate_in_video
    (reference sam2_video_predictor.py:40,156,592). Propagation covers
    frames after (forward) or before (reverse) the conditioning frame,
    matching the reference's traversal; the conditioning frame keeps its
    prompted mask."""

    def __init__(self, params: Params, cfg: SAM2Config):
        self.p = params
        self.cfg = cfg
        self._feats = None
        self._orig = None
        self._cond: Optional[Dict[str, Any]] = None

    def init_state(self, frames: List[np.ndarray],
                   enc_chunk: int = 8) -> None:
        """frames: list of (H, W, 3) uint8 RGB (in-memory, matching the
        reference's local mod sam2_video_predictor.py:48-60; resized to a
        square image_size and ImageNet-normalized, utils/misc.py).

        Encoding runs in `enc_chunk`-frame chunks: one jitted call over
        all T frames OOMs a 16 GB v5e at T=48/1024² (Hiera-large stage-1
        activations are ~19 MB/frame/tensor and the fused program's live
        set scales with T; measured round 4). Chunks are padded to a
        static shape so every call reuses one compiled executable."""
        import cv2
        S = self.cfg.image_size
        self._orig = frames[0].shape[:2]
        batch = np.stack([
            (cv2.resize(f, (S, S)).astype(np.float32) / 255.0 - IMG_MEAN)
            / IMG_STD for f in frames])
        # upload pixels at the PARAM dtype: with bf16 weights (production)
        # this halves the ~600 MB/clip of frame bytes the first encode
        # call blocks on — the Hiera trunk computes in bf16 either way;
        # f32 test params keep f32 pixels (torch-parity unchanged)
        pdt = next(x.dtype for x in jax.tree.leaves(self.p)
                   if hasattr(x, "dtype")
                   and jnp.issubdtype(x.dtype, jnp.floating))
        batch = batch.astype(pdt)
        # params as an explicit jit argument (closure constants embed into
        # the HLO — slow remote compiles, no cache reuse across weights)
        enc = jax.jit(lambda p, px: encode_frames(p, self.cfg, px))
        T = batch.shape[0]
        if T <= enc_chunk:
            feat16, s1, s0, pos16 = enc(self.p, jnp.asarray(batch))
        else:
            f16s, s1s, s0s = [], [], []
            for i in range(0, T, enc_chunk):
                chunk = batch[i:i + enc_chunk]
                pad = enc_chunk - chunk.shape[0]
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad, axis=0)])
                f16, s1, s0, pos16 = enc(self.p, jnp.asarray(chunk))
                if pad:
                    f16, s1, s0 = f16[:-pad], s1[:-pad], s0[:-pad]
                f16s.append(f16)
                s1s.append(s1)
                s0s.append(s0)
            feat16 = jnp.concatenate(f16s, axis=0)
            s1 = jnp.concatenate(s1s, axis=0)
            s0 = jnp.concatenate(s0s, axis=0)
        self._feats = (feat16, s1, s0, pos16)
        self._cond = None

    def add_new_points(self, frame_idx: int, points: np.ndarray,
                       labels: np.ndarray) -> np.ndarray:
        """Prompt one frame; returns its mask at the original resolution
        and stores the conditioning memory + object pointer."""
        cfg = self.cfg
        h, w = self._orig
        S = cfg.image_size
        pts = np.asarray(points, np.float32) / [w, h] * S
        labels = np.asarray(labels, np.int32)
        feat16, s1, s0, pos16 = self._feats
        # multimask only for 0..1 points (multimask_min/max_pt_num);
        # directly_add_no_mem_embed (sam2_base.py:639-643) inside the jit
        low_res, mem, obj_ptr = _prompt_forward(
            cfg, len(labels) <= 1, self.p, feat16[frame_idx],
            s0[frame_idx], s1[frame_idx], jnp.asarray(pts)[None],
            jnp.asarray(labels)[None])
        self._cond = {"frame": frame_idx, "mem": mem, "ptr": obj_ptr,
                      "low_res": low_res}
        return self._mask_to_orig(low_res)

    def _mask_to_orig(self, logits) -> np.ndarray:
        import cv2
        h, w = self._orig
        if isinstance(logits, jax.Array):
            m = np.asarray(logits.astype(jnp.float32))
        else:
            # already host numpy — do NOT round-trip it through the device
            # (48 upload+cast+download dispatches per propagate, measured)
            m = np.asarray(logits, np.float32)
        return cv2.resize(m, (w, h)) > 0

    def propagate_in_video(self, reverse: bool = False) -> np.ndarray:
        """Track through all frames. Returns (T, H, W) bool masks; frames
        on the untracked side of the conditioning frame are False (the
        reference's forward pass also leaves them untouched)."""
        assert self._cond is not None, "add_new_points first"
        feat16, s1, s0, pos16 = self._feats
        T = feat16.shape[0]
        start = self._cond["frame"]

        if reverse:
            order = np.arange(start - 1, -1, -1)
        else:
            order = np.arange(start + 1, T)
        lowres_g = self._cond["low_res"].shape[-1]
        out_logits = np.full((T, lowres_g, lowres_g), NO_OBJ_SCORE,
                             np.float32)
        out_logits[start] = np.asarray(self._cond["low_res"])
        if len(order):
            # pad the traversal to a multiple of 8 (repeating the last
            # frame): the scan program compiles per order LENGTH, and the
            # occ stage propagates from arbitrary keyframes — without
            # bucketing, every new seed frame costs two fresh multi-minute
            # remote compiles. Padded steps re-process the final frame
            # with already-updated memory; their outputs are sliced off
            # and the carry is discarded, so real outputs are unaffected.
            L = len(order)
            Lp = -(-L // 8) * 8
            padded = np.concatenate(
                [order, np.full(Lp - L, order[-1], order.dtype)])
            logits_seq = _propagate_scan(
                self.cfg, self.p, feat16, s1, s0, pos16,
                self._cond["mem"], self._cond["ptr"], jnp.asarray(padded))
            logits_np = np.asarray(logits_seq[:L].astype(jnp.float32))
            for j, t in enumerate(order):
                out_logits[t] = logits_np[j]
        return np.stack([self._mask_to_orig(m) for m in out_logits])


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
