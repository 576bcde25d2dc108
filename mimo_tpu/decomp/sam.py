"""SAM (Segment Anything) — image encoder, prompt encoder, mask decoder,
predictor, and automatic mask generation.

Reference: video_decomp/sam_automask/segment_anything/ (3,136 LoC vendored
SAM1): `Sam` (modeling/sam.py:18), `ImageEncoderViT` windowed attention +
decomposed rel-pos (modeling/image_encoder.py:17-363), `SamPredictor`
(predictor.py:17), `SamAutomaticMaskGenerator` (automatic_mask_generator.py:35-282).
Used by the decomposition pipeline for (a) the first-frame person mask from
a box prompt (run.py:137-207) and (b) occlusion candidate discovery via
32x32-point auto-masking + NMS (demo_occ.py:90-99).

TPU-native notes: the point-prompt batch of the auto-mask generator runs as
ONE batched decoder call (the reference loops in chunks of 64); mask NMS
and postprocessing stay host-side numpy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp.vit import ViTConfig, vit_init, vit_apply, tokens_to_grid
from mimo_tpu.models import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class SAMConfig:
    encoder: ViTConfig = field(default_factory=lambda: ViTConfig(
        img_size=(1024, 1024), patch_size=16, dim=1280, depth=32,
        num_heads=16, window_size=14, global_blocks=(7, 15, 23, 31),
        use_rel_pos=True, ln_eps=1e-6))     # ViT-H
    prompt_dim: int = 256
    image_embed_size: int = 64              # 1024/16
    decoder_depth: int = 2
    decoder_heads: int = 8
    num_mask_tokens: int = 4                # 1 whole + 3 multimask


def tiny_sam_config() -> SAMConfig:
    return SAMConfig(
        encoder=ViTConfig(img_size=(64, 64), patch_size=16, dim=32, depth=2,
                          num_heads=4, window_size=2, global_blocks=(1,),
                          use_rel_pos=True, ln_eps=1e-6),
        prompt_dim=32, image_embed_size=4, decoder_heads=4)


# ---------------------------------------------------------------------------
# neck + prompt encoder
# ---------------------------------------------------------------------------


def sam_init(key, cfg: SAMConfig) -> Params:
    keys = iter(jax.random.split(key, 64))
    d = cfg.prompt_dim
    p: Params = {
        "encoder": vit_init(next(keys), cfg.encoder),
        "neck_conv1": L.conv2d_init(next(keys), 1, 1, cfg.encoder.dim, d,
                                    bias=False),
        "neck_ln1": L.layer_norm_init(d),
        "neck_conv2": L.conv2d_init(next(keys), 3, 3, d, d, bias=False),
        "neck_ln2": L.layer_norm_init(d),
        # prompt encoder: random-fourier positional matrix + point type embeds
        "pe_gaussian": jax.random.normal(next(keys), (2, d // 2)),
        "point_embed": jax.random.normal(next(keys), (4, d)) * 0.02,
        "not_a_point": jax.random.normal(next(keys), (d,)) * 0.02,
        "no_mask_embed": jax.random.normal(next(keys), (d,)) * 0.02,
        # decoder tokens
        "iou_token": jax.random.normal(next(keys), (d,)) * 0.02,
        "mask_tokens": jax.random.normal(next(keys),
                                         (cfg.num_mask_tokens, d)) * 0.02,
        "decoder": [_twoway_block_init(next(keys), d, cfg.decoder_heads)
                    for _ in range(cfg.decoder_depth)],
        "final_attn": _sam_attn_init(next(keys), d, d // 2),
        "final_ln": L.layer_norm_init(d),
        # upscaling: 2 conv-transpose stages d -> d/4 -> d/8
        "up1": _deconv_init(next(keys), d, d // 4),
        "up_ln": L.layer_norm_init(d // 4),
        "up2": _deconv_init(next(keys), d // 4, d // 8),
        "mask_mlps": [
            _mlp3_init(next(keys), d, d, d // 8)
            for _ in range(cfg.num_mask_tokens)
        ],
        "iou_mlp": _mlp3_init(next(keys), d, d, cfg.num_mask_tokens),
    }
    return p


def _deconv_init(key, c_in, c_out) -> Params:
    bound = 1.0 / np.sqrt(c_in * 4)
    return {"kernel": jax.random.uniform(key, (2, 2, c_in, c_out),
                                         minval=-bound, maxval=bound),
            "bias": jnp.zeros((c_out,))}


def _deconv2x(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jax.lax.conv_transpose(
        x, p["kernel"].astype(x.dtype), strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(y.dtype)


def _mlp3_init(key, d_in, d_hidden, d_out) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {"fc1": L.linear_init(k1, d_in, d_hidden),
            "fc2": L.linear_init(k2, d_hidden, d_hidden),
            "fc3": L.linear_init(k3, d_hidden, d_out)}


def _mlp3(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = jax.nn.relu(L.linear(p["fc1"], x))
    x = jax.nn.relu(L.linear(p["fc2"], x))
    return L.linear(p["fc3"], x)


def _sam_attn_init(key, d: int, inner: int) -> Params:
    """SAM decoder attention: all projections carry biases (nn.Linear
    defaults in the published SAM), optionally internally downsampled."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "to_q": L.linear_init(k1, d, inner),
        "to_k": L.linear_init(k2, d, inner),
        "to_v": L.linear_init(k3, d, inner),
        "to_out": L.linear_init(k4, inner, d),
    }


def _twoway_block_init(key, d: int, heads: int) -> Params:
    k = jax.random.split(key, 6)
    return {
        "self_attn": _sam_attn_init(k[0], d, d),
        "ln1": L.layer_norm_init(d),
        "t2i": _sam_attn_init(k[1], d, d // 2),
        "ln2": L.layer_norm_init(d),
        "mlp_fc1": L.linear_init(k[2], d, 8 * d),
        "mlp_fc2": L.linear_init(k[3], 8 * d, d),
        "ln3": L.layer_norm_init(d),
        "i2t": _sam_attn_init(k[4], d, d // 2),
        "ln4": L.layer_norm_init(d),
    }


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def encode_image(p: Params, cfg: SAMConfig,
                 pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: (B, S, S, 3) SAM-normalized -> (B, g, g, prompt_dim)."""
    tokens = vit_apply(p["encoder"], cfg.encoder, pixels)
    g = cfg.encoder.img_size[0] // cfg.encoder.patch_size
    x = tokens_to_grid(tokens, cfg.encoder, g,
                       cfg.encoder.img_size[1] // cfg.encoder.patch_size)
    x = L.conv2d(p["neck_conv1"], x, padding=0)
    x = L.layer_norm(p["neck_ln1"], x, 1e-6)
    x = L.conv2d(p["neck_conv2"], x, padding=1)
    return L.layer_norm(p["neck_ln2"], x, 1e-6)


def _pe_encode(p: Params, coords01: jnp.ndarray) -> jnp.ndarray:
    """Random-fourier positional encoding of [0,1] coords (..., 2) -> (..., d)."""
    x = (2.0 * coords01 - 1.0) @ p["pe_gaussian"].astype(coords01.dtype)
    x = 2 * jnp.pi * x
    return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


def _dense_pe(p: Params, g: int, dtype) -> jnp.ndarray:
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    return _pe_encode(p, grid.astype(dtype))               # (g, g, d)


def encode_points(p: Params, points01: jnp.ndarray,
                  labels: jnp.ndarray) -> jnp.ndarray:
    """points01: (B, N, 2) in [0,1]; labels: (B, N) in {-1 pad, 0 neg,
    1 pos, 2/3 box corners}. Returns sparse prompt embeddings (B, N, d)."""
    pe = _pe_encode(p, points01)
    emb = p["point_embed"].astype(pe.dtype)
    out = pe + jnp.where((labels == 0)[..., None], emb[0], 0)
    out = out + jnp.where((labels == 1)[..., None], emb[1], 0)
    out = out + jnp.where((labels == 2)[..., None], emb[2], 0)
    out = out + jnp.where((labels == 3)[..., None], emb[3], 0)
    out = jnp.where((labels == -1)[..., None],
                    p["not_a_point"].astype(pe.dtype), out)
    return out


def decode_masks(p: Params, cfg: SAMConfig, image_embed: jnp.ndarray,
                 sparse: jnp.ndarray):
    """Two-way transformer decoder.

    image_embed: (g, g, d) single image; sparse: (B, N, d) prompt batch.
    Returns (masks (B, num_mask_tokens, 4g, 4g), iou_pred (B, num_mask_tokens)).
    """
    g = image_embed.shape[0]
    d = cfg.prompt_dim
    B = sparse.shape[0]

    tokens = jnp.concatenate([
        jnp.broadcast_to(p["iou_token"].astype(sparse.dtype)[None, None],
                         (B, 1, d)),
        jnp.broadcast_to(p["mask_tokens"].astype(sparse.dtype)[None],
                         (B, cfg.num_mask_tokens, d)),
        sparse,
    ], axis=1)
    n_prefix = 1 + cfg.num_mask_tokens

    src = (image_embed + p["no_mask_embed"].astype(image_embed.dtype)
           ).reshape(1, g * g, d)
    src = jnp.broadcast_to(src, (B, g * g, d))
    pos = _dense_pe(p, g, image_embed.dtype).reshape(1, g * g, d)
    pos = jnp.broadcast_to(pos, (B, g * g, d))

    # SAM TwoWayTransformer semantics (post-norm; PEs added to q/k each
    # layer, never to v; first block's self-attention skips the PE)
    q = tokens
    token_pe = tokens
    for i, blk in enumerate(p["decoder"]):
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

    q = q + _xattn(p["final_attn"], q + token_pe, src + pos, src,
                   cfg.decoder_heads)
    q = L.layer_norm(p["final_ln"], q)

    # upscale image features and produce masks
    img = src.reshape(B, g, g, d)
    up = _deconv2x(p["up1"], img)
    up = jax.nn.gelu(L.layer_norm(p["up_ln"], up).astype(jnp.float32),
                     approximate=False).astype(up.dtype)
    up = jax.nn.gelu(_deconv2x(p["up2"], up).astype(jnp.float32),
                     approximate=False).astype(up.dtype)   # (B, 4g, 4g, d/8)

    mask_embeds = jnp.stack([
        _mlp3(p["mask_mlps"][i], q[:, 1 + i]) for i in range(cfg.num_mask_tokens)
    ], axis=1)                                             # (B, M, d/8)
    masks = jnp.einsum("bmc,bhwc->bmhw", mask_embeds, up)
    iou = _mlp3(p["iou_mlp"], q[:, 0])                     # (B, M)
    return masks, iou


def _xattn(p_attn: Params, q: jnp.ndarray, kv_k: jnp.ndarray,
           kv_v: jnp.ndarray, heads: int) -> jnp.ndarray:
    # compute in the PARAM dtype: the f32 fourier prompt encodings
    # otherwise promote q/k to f32 while v stays bf16, and the TPU
    # attention paths (flash kernel, jax.nn.dot_product_attention)
    # reject mixed-dtype q/k/v (bf16 params => whole decoder on bf16,
    # which is also what the reference's autocast does)
    dt = p_attn["to_q"]["kernel"].dtype
    qq = L.linear(p_attn["to_q"], q.astype(dt))
    kk = L.linear(p_attn["to_k"], kv_k.astype(dt))
    vv = L.linear(p_attn["to_v"], kv_v.astype(dt))
    o = L.sdpa(qq, kk, vv, heads)
    return L.linear(p_attn["to_out"], o)


# ---------------------------------------------------------------------------
# predictor API (host-facing)
# ---------------------------------------------------------------------------

SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SamPredictor:
    """set_image once, predict many prompts (reference predictor.py:17)."""

    def __init__(self, params: Params, cfg: SAMConfig):
        self.params = params
        self.cfg = cfg
        self._embed = None
        self._orig_size = None
        # params as explicit jit arguments — closure-captured jax.Arrays
        # are embedded into the HLO as literals (slow remote compiles, no
        # cache reuse across weight values)
        self._encode = jax.jit(lambda p, px: encode_image(p, cfg, px))
        self._decode = jax.jit(
            lambda p, emb, pts, lbl: decode_masks(
                p, cfg, emb, encode_points(p, pts, lbl)))
        # Device-side auto-mask postprocess (see automatic_masks): binarize
        # the candidate logits inside the valid (unpadded) image region and
        # compute the full pairwise intersection matrix as ONE bf16 matmul
        # with f32 accumulation (0/1 products are exact; row sums <= (4g)^2
        # << 2^24 stay exact in f32). The MXU does in ~10 ms what the host
        # numpy loop did in minutes.
        def _nms_stats(m, valid):
            b = ((m > 0) & valid).reshape(m.shape[0], -1)
            b = b.astype(jnp.bfloat16)
            inter = jax.lax.dot_general(
                b, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.diagonal(inter), inter
        self._nms_stats = jax.jit(_nms_stats)
        self._gather_bin = jax.jit(lambda m, idx: m[idx] > 0)

    def set_image(self, image: np.ndarray) -> None:
        """image: (H, W, 3) uint8 RGB; resized (long side) to encoder size."""
        S = self.cfg.encoder.img_size[0]
        h, w = image.shape[:2]
        scale = S / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        import cv2
        resized = cv2.resize(image, (nw, nh))
        canvas = np.zeros((S, S, 3), np.float32)
        canvas[:nh, :nw] = (resized.astype(np.float32) - SAM_MEAN) / SAM_STD
        self._embed = self._encode(self.params,
                                   jnp.asarray(canvas)[None])[0]
        self._orig_size = (h, w)
        self._scaled = (nh, nw)

    def predict(self, points: Optional[np.ndarray] = None,
                labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None):
        """points: (N, 2) xy pixels; labels (N,); box (4,) xyxy. Returns
        (masks (M, H, W) bool, iou (M,)) at the original resolution."""
        assert self._embed is not None, "call set_image first"
        h, w = self._orig_size
        nh, nw = self._scaled
        S = self.cfg.encoder.img_size[0]
        prompts, lbls = [], []
        if points is not None:
            pts = np.asarray(points, np.float32)
            pts = pts * [nw / w, nh / h]
            prompts.append(pts / S)
            lbls.append(np.asarray(labels, np.int32))
        if box is not None:
            bx = np.asarray(box, np.float32).reshape(2, 2)
            bx = bx * [nw / w, nh / h]
            prompts.append(bx / S)
            lbls.append(np.array([2, 3], np.int32))
        pts = np.concatenate(prompts, axis=0)[None]
        lbl = np.concatenate(lbls, axis=0)[None]
        masks, iou = self._decode(self.params, self._embed,
                                  jnp.asarray(pts), jnp.asarray(lbl))
        masks = np.asarray(masks[0].astype(jnp.float32))    # (M, 4g, 4g)
        import cv2
        out = []
        frac_h = nh / S
        frac_w = nw / S
        for m in masks:
            mg = m.shape[-1]
            mm = m[: int(round(mg * frac_h)), : int(round(mg * frac_w))]
            mm = cv2.resize(mm, (w, h))
            out.append(mm > 0)
        return np.stack(out), np.asarray(iou[0])


def automatic_masks(predictor: SamPredictor, image: np.ndarray,
                    points_per_side: int = 32, pred_iou_thresh: float = 0.88,
                    nms_iou: float = 0.7,
                    min_area: int = 0) -> List[Dict[str, Any]]:
    """SAM automatic mask generation (reference
    automatic_mask_generator.py:35-282; used with 32x32 points at
    demo_occ.py:90-99): a regular point grid prompts the decoder — here the
    entire grid is ONE batched decoder call — then IoU filtering + mask NMS.

    TPU-native postprocess (round 5): the reference's greedy mask NMS
    compares every candidate against every kept mask with full-resolution
    numpy AND/OR — O(N * kept * H * W) host work that measured ~100+ s per
    keyframe at N≈3000 (the occ stage's 291 s wall held only 0.93 s of
    device compute). Here the pairwise intersection matrix is ONE device
    matmul over the binarized low-res (4g × 4g) logits, the greedy NMS
    walks that tiny matrix on the host, and only the kept masks (typically
    tens, not thousands) are transferred and resized to full resolution.
    NMS IoU is thus measured on the decoder grid rather than after
    full-res resize — the bilinear >0 upsample preserves overlap ratios to
    ~1/4g, far below the 0.7 decision threshold's sensitivity. min_area
    is applied post-NMS at full resolution (with min_area=0, the default
    everywhere, only empty masks drop — identical behavior).
    """
    import os as _os
    import sys as _sys
    import time as _time
    _dbg = bool(_os.environ.get("MIMO_OCC_DEBUG"))
    _t = [_time.time()]

    def _phase(name):
        if _dbg:
            now = _time.time()
            print(f"# automask {name}: {now - _t[0]:.1f}s",
                  file=_sys.stderr, flush=True)
            _t[0] = now

    predictor.set_image(image)
    if _dbg:
        float(jnp.sum(predictor._embed.astype(jnp.float32)))
    _phase("set_image+encode")
    h, w = image.shape[:2]
    nh, nw = predictor._scaled
    S = predictor.cfg.encoder.img_size[0]

    xs = (np.arange(points_per_side) + 0.5) / points_per_side
    grid = np.stack(np.meshgrid(xs, xs, indexing="xy"), axis=-1).reshape(-1, 2)
    pts01 = grid * [nw / S, nh / S]
    pts = jnp.asarray(pts01, jnp.float32)[:, None, :]      # (P, 1, 2)
    lbl = jnp.ones((pts.shape[0], 1), jnp.int32)
    # decode in fixed-size prompt chunks: the whole 1024-prompt batch
    # broadcasts the image tokens per prompt — (1024, 4096, 256) f32
    # intermediates peak near the 16 GB HBM limit and OOM
    # fragmentation-dependently on the second clip of a process
    # (reference chunks at 64, automatic_mask_generator.py:64).
    # 256 keeps the MXU batched and the peak at ~1/4.
    CH = min(256, pts.shape[0])
    mparts, iparts = [], []
    for i in range(0, pts.shape[0], CH):
        pc, lc = pts[i:i + CH], lbl[i:i + CH]
        if pc.shape[0] < CH:
            pad = CH - pc.shape[0]
            pc = jnp.concatenate([pc, jnp.broadcast_to(pc[-1:],
                                                       (pad,) + pc.shape[1:])])
            lc = jnp.concatenate([lc, jnp.broadcast_to(lc[-1:],
                                                       (pad,) + lc.shape[1:])])
            m, s = predictor._decode(predictor.params, predictor._embed,
                                     pc, lc)
            m, s = m[:-pad], s[:-pad]
        else:
            m, s = predictor._decode(predictor.params, predictor._embed,
                                     pc, lc)
        mparts.append(m)
        iparts.append(s)
    masks = jnp.concatenate(mparts, axis=0)
    iou = jnp.concatenate(iparts, axis=0)
    if _dbg:
        float(jnp.sum(iou.astype(jnp.float32)))
    _phase("decode")

    # flatten multimask outputs (skip the "whole" token 0, as the reference's
    # multimask_output=True path uses tokens 1..3) — on device
    g4 = masks.shape[-1]
    cand = masks[:, 1:].reshape(-1, g4, g4)
    cand_iou = np.asarray(iou)[:, 1:].reshape(-1)

    # valid (unpadded) region of the decoder grid for this aspect ratio
    vh, vw = int(round(g4 * nh / S)), int(round(g4 * nw / S))
    valid = np.zeros((g4, g4), bool)
    valid[:vh, :vw] = True
    areas_lr, inter = predictor._nms_stats(cand, jnp.asarray(valid))
    areas_lr = np.asarray(areas_lr)
    inter = np.asarray(inter)
    _phase("nms_stats+transfer")

    ok = (cand_iou > pred_iou_thresh) & (areas_lr > 0)
    order = np.argsort(-cand_iou, kind="stable")
    kept_idx: List[int] = []
    for i in order:
        if not ok[i]:
            continue
        dup = False
        for j in kept_idx:
            u = areas_lr[i] + areas_lr[j] - inter[i, j]
            if u > 0 and inter[i, j] / u > nms_iou:
                dup = True
                break
        if not dup:
            kept_idx.append(int(i))
    _phase(f"greedy nms (kept {len(kept_idx)})")

    if not kept_idx:
        return []
    # gather only the kept masks, padded to a small static batch so every
    # keyframe reuses one compiled gather
    K = 64
    import cv2
    results = []
    for base in range(0, len(kept_idx), K):
        chunk = kept_idx[base:base + K]
        idx = np.asarray(chunk + [chunk[-1]] * (K - len(chunk)), np.int32)
        bin_masks = np.asarray(predictor._gather_bin(cand, jnp.asarray(idx)))
        for mm_lr, i in zip(bin_masks[:len(chunk)], chunk):
            mm = cv2.resize(mm_lr[:vh, :vw].astype(np.float32), (w, h)) > 0.5
            area = int(mm.sum())
            if area <= min_area:
                continue
            results.append({"segmentation": mm, "area": area,
                            "predicted_iou": float(cand_iou[i])})
    _phase(f"gather+resize ({len(results)} results)")
    return results


def mask_nms(results: List[Dict[str, Any]],
             iou_thresh: float = 0.7) -> List[Dict[str, Any]]:
    """Greedy mask-overlap NMS (reference tools/auto_mask.py:43-134)."""
    results = sorted(results, key=lambda r: -r["predicted_iou"])
    kept: List[Dict[str, Any]] = []
    for r in results:
        seg = r["segmentation"]
        ok = True
        for kr in kept:
            inter = np.logical_and(seg, kr["segmentation"]).sum()
            union = np.logical_or(seg, kr["segmentation"]).sum()
            if union and inter / union > iou_thresh:
                ok = False
                break
        if ok:
            kept.append(r)
    return kept
