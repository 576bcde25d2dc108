"""ProPainter video inpainting, JAX/TPU — checkpoint-exact architecture.

Reference: video_decomp/ProPainter/ (12.3k LoC):
- `RecurrentFlowCompleteNet` (model/recurrent_flow_completion.py:200-347):
  P3D encoder (spatial conv + dilated temporal conv), dilated mid block,
  BidirectionalPropagation with SecondOrderDeformableAlignment
  (:9-46, deform_groups=16, max residue 5), bilinear deconv decoder, and
  `forward_bidirect_flow`/`combine_flow` (:300-345).
- `InpaintGenerator` (model/propainter.py:256-372): grouped-conv Encoder
  (:193-233), SoftSplit/SoftComp 50%-overlap token (un)folding
  (modules/sparse_transformer.py:7-62, kernel 7 stride 3 pad 3),
  `TemporalSparseTransformerBlock` stack (:285-344) with
  `SparseWindowAttention` (:117-283: window + rolled-ring + pooled global
  keys, masked/unmasked window split, temporal dilation T_ind),
  FusionFeedForward with fold/unfold re-normalization (:65-103),
  flow-guided `DeformableAlignment` feature propagation (propainter.py:
  34-70, max residue 3 + flow prior) and non-learnable image propagation
  with forward-backward consistency checks (propainter.py:74-190).
- `Propainter.process` orchestration (infer.py:380-564): RAFT chunking by
  width (short_clip_len), flow completion in subvideo_length chunks with
  5-frame pads, image propagation in <=100-frame chunks with 10-frame
  pads, and the neighbor_stride sliding window with ref_stride reference
  frames and 0.5/0.5 overlap blending.

TPU-native notes: recurrent propagation is `lax.scan` with a two-step
(second-order) carry; the masked/unmasked window split is computed as two
static attention paths selected per window (the reference's dynamic
nonzero() indexing is replaced by a select — exact, shapes static); the
CUDA deform_conv2d becomes ops/sampling.deform_conv2d (bilinear gathers +
one matmul).
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.models import layers as L
from mimo_tpu.ops.sampling import (deform_conv2d, deform_conv2d_window,
                                   flow_warp)

Params = Dict[str, Any]


@dataclass(frozen=True)
class ProPainterConfig:
    channel: int = 128          # generator feature channels at 1/4 res
    hidden: int = 512           # transformer token dim
    fc_dim: int = 32            # flow-completion base channels
    kernel: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)
    window: Tuple[int, int] = (5, 9)
    pool: Tuple[int, int] = (4, 4)
    depths: int = 8
    heads: int = 4
    ffn_hidden: int = 1960      # 49 * 40 (folds to a 40-ch map)
    deform_groups: int = 16
    t_dilation: int = 2
    neighbor_length: int = 10
    ref_stride: int = 10
    subvideo_length: int = 80
    raft_iters: int = 20


def tiny_propainter_config() -> ProPainterConfig:
    return ProPainterConfig(channel=16, hidden=32, fc_dim=8,
                            kernel=(3, 3), stride=(2, 2), padding=(1, 1),
                            window=(2, 3), pool=(2, 2), depths=2, heads=2,
                            ffn_hidden=9 * 4, deform_groups=4,
                            neighbor_length=4, ref_stride=4,
                            subvideo_length=8, raft_iters=2)


def _lrelu(x, slope=0.2):
    return jax.nn.leaky_relu(x, slope)


# ---------------------------------------------------------------------------
# deformable alignment modules
# ---------------------------------------------------------------------------


def _offset_stack_init(key, c_in: int, c: int, groups: int) -> Params:
    """conv_offset: 4 convs, last zero-init (constant_init val=0 bias=0,
    recurrent_flow_completion.py:16-29)."""
    k = jax.random.split(key, 4)
    return {
        "c1": L.conv2d_init(k[0], 3, 3, c_in, c),
        "c2": L.conv2d_init(k[1], 3, 3, c, c),
        "c3": L.conv2d_init(k[2], 3, 3, c, c),
        "c4": L.conv2d_init(k[3], 3, 3, c, 27 * groups, zero=True),
    }


def _offset_stack(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.leaky_relu(L.conv2d(p["c1"], x, padding=1), 0.1)
    h = jax.nn.leaky_relu(L.conv2d(p["c2"], h, padding=1), 0.1)
    h = jax.nn.leaky_relu(L.conv2d(p["c3"], h, padding=1), 0.1)
    return L.conv2d(p["c4"], h, padding=1)


def _deform_align_init(key, c_in: int, c_out: int, cond_in: int,
                       groups: int) -> Params:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in * 9)
    return {
        "offset": _offset_stack_init(k1, cond_in, c_out, groups),
        "kernel": jax.random.uniform(k2, (3, 3, c_in, c_out),
                                     minval=-bound, maxval=bound),
        "bias": jnp.zeros((c_out,)),
    }


def _deform_align(p: Params, x: jnp.ndarray, cond: jnp.ndarray,
                  groups: int, max_residue: float,
                  flow: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(Second-order)DeformableAlignment forward: offsets/mask from the
    conv_offset stack; offset = max_residue*tanh(cat(o1,o2)) (+ per-tap
    flow prior for the generator variant, propainter.py:57-70)."""
    out = _offset_stack(p["offset"], cond)
    n = out.shape[-1] // 3
    o1, o2, mask = out[..., :n], out[..., n:2 * n], out[..., 2 * n:]
    offset = max_residue * jnp.tanh(jnp.concatenate([o1, o2], axis=-1))
    if flow is not None:
        # flow.flip(1) -> (dy, dx) pairs repeated over all (group, tap)
        fl = flow[..., ::-1]
        offset = offset + jnp.tile(fl, (1, 1, 1, offset.shape[-1] // 2))
        return deform_conv2d(x, offset, p["kernel"], p["bias"],
                             mask=jax.nn.sigmoid(mask),
                             deform_groups=groups)
    # no flow prior -> offsets bounded by max_residue*tanh: use the
    # gather-free static-window kernel (ops/sampling.py). The gather form
    # unrolled ~40k HLO ops at the flow-completion shape — 637 s compile
    # for an 8f program and a worker crash at 23f (round-5 profile_flow).
    return deform_conv2d_window(x, offset, p["kernel"], p["bias"],
                                mask=jax.nn.sigmoid(mask),
                                deform_groups=groups,
                                max_abs_offset=max_residue)


# ---------------------------------------------------------------------------
# flow completion net
# ---------------------------------------------------------------------------


def _p3d_init(key, c_in, c_out) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "spatial": L.conv2d_init(k1, 3, 3, c_in, c_out),
        # temporal conv kernel 3, dilation 2 (recurrent_flow_completion.py
        # :159-163) stored as (3, C, C)
        "temporal": {
            "kernel": jax.random.normal(k2, (3, c_out, c_out))
            * (1.0 / math.sqrt(3 * c_out)),
            "bias": jnp.zeros((c_out,)),
        },
    }


def _temporal_conv(p: Params, x: jnp.ndarray, dilation: int = 2):
    """Conv over the frame axis, kernel 3, dilation 2, zero padding 2
    (Conv3d (3,1,1) pad (2,0,0) dil (2,1,1)). x: (T, h, w, c)."""
    k = p["kernel"].astype(x.dtype)
    T = x.shape[0]
    xp = jnp.pad(x, ((dilation, dilation), (0, 0), (0, 0), (0, 0)))
    out = (jnp.einsum("thwc,cd->thwd", xp[:T], k[0])
           + jnp.einsum("thwc,cd->thwd", xp[dilation:dilation + T], k[1])
           + jnp.einsum("thwc,cd->thwd", xp[2 * dilation:2 * dilation + T],
                        k[2]))
    return out + p["bias"].astype(x.dtype)


def _p3d(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    h = _lrelu(L.conv2d(p["spatial"], x, stride=stride, padding=1))
    return _temporal_conv(p["temporal"], h)


def flow_complete_init(key, cfg: ProPainterConfig) -> Params:
    keys = iter(jax.random.split(key, 32))
    b = cfg.fc_dim
    g = cfg.deform_groups

    def bidir_prop(c):
        return {
            "align_bwd": _deform_align_init(next(keys), 2 * c, c, 3 * c, g),
            "align_fwd": _deform_align_init(next(keys), 2 * c, c, 3 * c, g),
            "backbone_bwd": [L.conv2d_init(next(keys), 3, 3, 2 * c, c),
                             L.conv2d_init(next(keys), 3, 3, c, c)],
            "backbone_fwd": [L.conv2d_init(next(keys), 3, 3, 3 * c, c),
                             L.conv2d_init(next(keys), 3, 3, c, c)],
            "fusion": L.conv2d_init(next(keys), 1, 1, 2 * c, c),
        }

    return {
        "down": L.conv2d_init(next(keys), 5, 5, 3, b),
        "enc1a": _p3d_init(next(keys), b, b),
        "enc1b": _p3d_init(next(keys), b, 2 * b),
        "enc2a": _p3d_init(next(keys), 2 * b, 2 * b),
        "enc2b": _p3d_init(next(keys), 2 * b, 4 * b),
        "mid": [L.conv2d_init(next(keys), 3, 3, 4 * b, 4 * b)
                for _ in range(3)],
        "prop": bidir_prop(4 * b),
        "dec2": [L.conv2d_init(next(keys), 3, 3, 4 * b, 4 * b),
                 L.conv2d_init(next(keys), 3, 3, 4 * b, 2 * b)],
        "dec1": [L.conv2d_init(next(keys), 3, 3, 2 * b, 2 * b),
                 L.conv2d_init(next(keys), 3, 3, 2 * b, b)],
        "up": [L.conv2d_init(next(keys), 3, 3, b, b),
               L.conv2d_init(next(keys), 3, 3, b, 2)],
    }


def _upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)."""
    T, h, w, c = x.shape
    return jax.image.resize(x, (T, 2 * h, 2 * w, c), method="bilinear")


def _align_corners_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x with align_corners=True (deconv module,
    recurrent_flow_completion.py:128-146). jax.image.resize is
    half-pixel (align_corners=False), so build the align_corners grid
    explicitly via linear interpolation weights."""
    T, h, w, c = x.shape
    H, W = 2 * h, 2 * w

    def coords(n_out, n_in):
        if n_in == 1:
            return jnp.zeros((n_out,)), jnp.zeros((n_out,), jnp.int32), \
                jnp.zeros((n_out,), jnp.int32)
        pos = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        return pos - lo, lo, lo + 1

    fy, y0, y1 = coords(H, h)
    fx, x0, x1 = coords(W, w)
    # separable: interpolate x at the SMALL height first, then y — the
    # bilinear product form (top/bot built from four (T,H,W,c) gathers)
    # held ~6 GB of transients at the decoder's 720×480×32 level and
    # OOMed the v5e (round-4 decomp ledger); per-axis is the same math
    xa = x[:, :, x0] * (1 - fx)[None, None, :, None] \
        + x[:, :, x1] * fx[None, None, :, None]          # (T, h, W, c)
    return xa[:, y0] * (1 - fy)[None, :, None, None] \
        + xa[:, y1] * fy[None, :, None, None]


def _second_order_prop(p: Params, x: jnp.ndarray, reverse: bool,
                       groups: int, extra: Optional[jnp.ndarray] = None,
                       backbone_key: str = "", align_key: str = ""):
    """BidirectionalPropagation single direction
    (recurrent_flow_completion.py:48-127): second-order deformable
    alignment with cond = [prev1, current, prev2]; backbone refine.
    x: (T, h, w, c); extra: (T, h, w, c) features from the other
    direction (forward pass consumes the backward outputs)."""
    T, h, w, c = x.shape
    seq = x[::-1] if reverse else x
    seq_extra = None if extra is None else (extra[::-1] if reverse
                                            else extra)

    def step(carry, inp):
        i, prev1, prev2 = carry
        cur = inp if seq_extra is None else inp[0]

        def aligned_prop():
            cond = jnp.concatenate([prev1, cur, prev2], axis=-1)
            xx = jnp.concatenate([prev1, prev2], axis=-1)
            return _deform_align(p[align_key], xx[None], cond[None],
                                 groups, 5.0)[0]

        feat_prop = jnp.where(i > 0, aligned_prop(), jnp.zeros_like(cur))
        if seq_extra is None:
            feat = jnp.concatenate([cur, feat_prop], axis=-1)
        else:
            feat = jnp.concatenate([cur, inp[1], feat_prop], axis=-1)
        bb = p[backbone_key]
        r = jax.nn.leaky_relu(L.conv2d(bb[0], feat[None], padding=1), 0.1)
        feat_prop = feat_prop + L.conv2d(bb[1], r, padding=1)[0]
        # deform-align/warp fp32 grid math promotes bf16; pin the carry
        feat_prop = feat_prop.astype(cur.dtype)
        return (i + 1, feat_prop, prev1), feat_prop

    init = (jnp.asarray(0), jnp.zeros((h, w, c), x.dtype),
            jnp.zeros((h, w, c), x.dtype))
    xs = seq if seq_extra is None else (seq, seq_extra)
    _, outs = jax.lax.scan(step, init, xs)
    return outs[::-1] if reverse else outs


def flow_complete_forward(p: Params, cfg: ProPainterConfig,
                          masked_flows: jnp.ndarray,
                          masks: jnp.ndarray) -> jnp.ndarray:
    """RecurrentFlowCompleteNet.forward (recurrent_flow_completion.py:
    273-313). masked_flows: (T, H, W, 2); masks: (T, H, W, 1).
    Returns predicted flow (T, H, W, 2)."""
    g = cfg.deform_groups
    x = jnp.concatenate([masked_flows, masks], axis=-1)
    # replicate-padded 5x5 stride-2 downsample
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    h0 = _lrelu(L.conv2d(p["down"], xp, stride=2, padding=0))

    e1 = _lrelu(_p3d(p["enc1a"], h0, 1))
    e1 = _lrelu(_p3d(p["enc1b"], e1, 2))          # 4x
    e2 = _lrelu(_p3d(p["enc2a"], e1, 1))
    e2 = _lrelu(_p3d(p["enc2b"], e2, 2))          # 8x

    m = e2
    for conv, dil in zip(p["mid"], (3, 2, 1)):
        m = _lrelu(jax.lax.conv_general_dilated(
            m, conv["kernel"].astype(m.dtype), (1, 1),
            [(dil, dil), (dil, dil)], rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + conv["bias"].astype(m.dtype))

    # bidirectional second-order propagation + fusion (+ residual)
    pr = p["prop"]
    f_b = _second_order_prop(pr, m, True, g, backbone_key="backbone_bwd",
                             align_key="align_bwd")
    f_f = _second_order_prop(pr, m, False, g, extra=f_b,
                             backbone_key="backbone_fwd",
                             align_key="align_fwd")
    fused = L.conv2d(pr["fusion"], jnp.concatenate([f_b, f_f], -1),
                     padding=0) + m

    d2 = _lrelu(L.conv2d(p["dec2"][0], fused, padding=1))
    d2 = _lrelu(L.conv2d(p["dec2"][1], _align_corners_2x(d2), padding=1))
    d2 = d2 + e1
    d1 = _lrelu(L.conv2d(p["dec1"][0], d2, padding=1))
    d1 = _lrelu(L.conv2d(p["dec1"][1], _align_corners_2x(d1), padding=1))
    u = _lrelu(L.conv2d(p["up"][0], d1, padding=1))
    return L.conv2d(p["up"][1], _align_corners_2x(u), padding=1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward_bidirect_flow(p: Params, cfg: ProPainterConfig,
                          flows_f: jnp.ndarray, flows_b: jnp.ndarray,
                          masks: jnp.ndarray):
    """forward_bidirect_flow + combine_flow (recurrent_flow_completion.py
    :300-345). flows_f/b: (T-1, H, W, 2); masks: (T, H, W, 1).

    Jitted whole (round 4): the eager path dispatched each of the ~200
    ops through the ~35 ms axon tunnel — the round-4 ledger's ~11 min
    flow-complete wall was dominated by dispatch latency, not compute."""
    m_f = masks[:-1]
    m_b = masks[1:]
    pred_f = flow_complete_forward(p, cfg, flows_f * (1 - m_f), m_f)
    pred_b = flow_complete_forward(p, cfg, (flows_b * (1 - m_b))[::-1],
                                   m_b[::-1])[::-1]
    out_f = pred_f * m_f + flows_f * (1 - m_f)
    out_b = pred_b * m_b + flows_b * (1 - m_b)
    return out_f, out_b


# ---------------------------------------------------------------------------
# image / feature propagation (InpaintGenerator BidirectionalPropagation)
# ---------------------------------------------------------------------------


def _length_sq(x):
    return jnp.sum(jnp.square(x), axis=-1, keepdims=True)


def _fb_consistency(flow_fw, flow_bw, alpha1=0.01, alpha2=0.5):
    """fbConsistencyCheck (propainter.py:22-31)."""
    flow_bw_warped = flow_warp(flow_bw[None], flow_fw[None])[0]
    flow_diff = flow_fw + flow_bw_warped
    mag_sq = _length_sq(flow_fw) + _length_sq(flow_bw_warped)
    thresh = alpha1 * mag_sq + alpha2
    return (_length_sq(flow_diff) < thresh).astype(flow_fw.dtype)


@jax.jit
def img_propagation(frames: jnp.ndarray, flows_f: jnp.ndarray,
                    flows_b: jnp.ndarray, masks: jnp.ndarray):
    """Non-learnable BidirectionalPropagation (propainter.py:74-190,
    learnable=False, interpolation='nearest' at the call site — we keep
    bilinear warping, the sub-pixel difference is below the binary-mask
    threshold for completed flows).

    frames: (T, H, W, 3) masked frames; flows_f/b: (T-1, H, W, 2);
    masks: (T, H, W, 1) 1=hole. Returns (prop_frames, updated_masks):
    forward-pass outputs, as the reference returns outputs_f/masks_f."""

    def binary(m, th=0.1):
        return (m > th).astype(m.dtype)

    def run(reverse):
        seq_x = frames[::-1] if reverse else frames
        seq_m = masks[::-1] if reverse else masks
        # backward pass propagates with forward flows; forward with
        # backward flows (propainter.py:116-136)
        fp = flows_f[::-1] if reverse else flows_b
        fc = flows_b[::-1] if reverse else flows_f

        def step(carry, inp):
            i, feat_prop, mask_prop = carry
            cur, mcur, flow_p, flow_c = inp

            valid = _fb_consistency(flow_p, flow_c)
            warped = flow_warp(feat_prop[None], flow_p[None])[0]
            mask_warped = binary(flow_warp(mask_prop[None],
                                           flow_p[None])[0])
            union = binary(mcur * valid * (1 - mask_warped))
            new_feat = union * warped + (1 - union) * cur
            new_mask = binary(mcur * (1 - valid * (1 - mask_warped)))

            use_prop = (i > 0).astype(cur.dtype)
            out_feat = use_prop * new_feat + (1 - use_prop) * cur
            out_mask = use_prop * new_mask + (1 - use_prop) * mcur
            # flow_warp's fp32 grid arithmetic promotes bf16 inputs; pin
            # the carry dtype or the scan rejects the carry (found driving
            # the factory path with bf16 params)
            out_feat = out_feat.astype(cur.dtype)
            out_mask = out_mask.astype(mcur.dtype)
            return (i + 1, out_feat, out_mask), (out_feat, out_mask)

        # frame at traversal step i consumes flow slot i-1 in traversal
        # order (propainter.py:120-146 flow_idx); pad the unused first slot
        pad = jnp.zeros_like(fp[:1])
        fpx = jnp.concatenate([pad, fp], 0)
        fcx = jnp.concatenate([pad, fc], 0)
        init = (jnp.asarray(0), jnp.zeros_like(frames[0]),
                jnp.zeros_like(masks[0]))
        _, (feats, ms) = jax.lax.scan(step, init,
                                      (seq_x, seq_m, fpx, fcx))
        if reverse:
            feats, ms = feats[::-1], ms[::-1]
        return feats, ms

    feats_b, _ = run(True)
    feats_f, masks_f = run(False)
    del feats_b  # outputs_f is what the reference uses (learnable=False)
    return feats_f, masks_f


def feat_propagation(p: Params, cfg: ProPainterConfig, feats: jnp.ndarray,
                     flows_f: jnp.ndarray, flows_b: jnp.ndarray,
                     masks2: jnp.ndarray) -> jnp.ndarray:
    """Learnable BidirectionalPropagation at 1/4 features (propainter.py:
    74-190, learnable=True): flow-guided DeformableAlignment + backbone
    refine per direction, then fuse with a residual.

    feats: (T, h, w, c); flows at feature res; masks2: (T, h, w, 2)
    [mask_in, mask_updated]."""
    g = cfg.deform_groups

    def run(x, reverse):
        seq_x = x[::-1] if reverse else x
        seq_m = masks2[::-1] if reverse else masks2
        fp = flows_f[::-1] if reverse else flows_b
        fc = flows_b[::-1] if reverse else flows_f
        pad = jnp.zeros_like(fp[:1])
        fpx = jnp.concatenate([pad, fp], 0)
        fcx = jnp.concatenate([pad, fc], 0)
        akey = "align_bwd" if reverse else "align_fwd"
        bkey = "backbone_bwd" if reverse else "backbone_fwd"

        def step(carry, inp):
            i, feat_prop = carry
            cur, mcur, flow_p, flow_c = inp

            def aligned():
                valid = _fb_consistency(flow_p, flow_c)
                warped = flow_warp(feat_prop[None], flow_p[None])[0]
                cond = jnp.concatenate(
                    [cur, warped, flow_p, valid, mcur], axis=-1)
                return _deform_align(p[akey], feat_prop[None], cond[None],
                                     g, 3.0, flow=flow_p[None])[0]

            fprop = jnp.where(i > 0, aligned(), cur)
            feat = jnp.concatenate([cur, fprop, mcur], axis=-1)[None]
            bb = p[bkey]
            r = _lrelu(L.conv2d(bb[0], feat, padding=1))
            fprop = fprop + L.conv2d(bb[1], r, padding=1)[0]
            fprop = fprop.astype(cur.dtype)      # pin the scan carry dtype
            return (i + 1, fprop), fprop

        init = (jnp.asarray(0), jnp.zeros_like(x[0]))
        _, outs = jax.lax.scan(step, init, (seq_x, seq_m, fpx, fcx))
        return outs[::-1] if reverse else outs

    outs_b = run(feats, True)
    outs_f = run(feats, False)
    cat = jnp.concatenate([outs_b, outs_f, masks2], axis=-1)
    fz = p["fuse"]
    r = _lrelu(L.conv2d(fz[0], cat, padding=1))
    return L.conv2d(fz[1], r, padding=1) + feats


# ---------------------------------------------------------------------------
# soft split / comp (50%-overlap unfold/fold) and fusion FF
# ---------------------------------------------------------------------------


def _unfold(x: jnp.ndarray, kernel, stride, padding) -> jnp.ndarray:
    """torch.nn.Unfold: x (T, H, W, C) -> (T, oh, ow, C*kh*kw) with
    channel-major (c, i, j) ordering inside the last axis."""
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    T, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    oh = (H + 2 * ph - kh) // sh + 1
    ow = (W + 2 * pw - kw) // sw + 1
    cols = []
    for i in range(kh):
        for j in range(kw):
            cols.append(jax.lax.slice(
                xp, (0, i, j, 0),
                (T, i + (oh - 1) * sh + 1, j + (ow - 1) * sw + 1, C),
                (1, sh, sw, 1)))
    # (T, oh, ow, kh*kw, C) -> channel-major (C, kh*kw)
    patches = jnp.stack(cols, axis=3)
    return patches.transpose(0, 1, 2, 4, 3).reshape(T, oh, ow, C * kh * kw)


def _fold(cols: jnp.ndarray, out_hw, kernel, stride, padding
          ) -> jnp.ndarray:
    """torch.nn.functional.fold: (T, oh, ow, C*kh*kw) channel-major ->
    (T, H, W, C), overlaps SUMMED.

    Each tap's strided placement is a `lax.pad` with interior padding
    (stride-1 zeros between patches) instead of a strided-slice
    scatter-add: XLA lowers scatters serially on TPU, while pad+add is a
    dense fusion — 49 taps collapse into one elementwise loop."""
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    H, W = out_hw
    T, oh, ow, _ = cols.shape
    C = cols.shape[-1] // (kh * kw)
    patches = cols.reshape(T, oh, ow, C, kh * kw)
    Hp, Wp = H + 2 * ph, W + 2 * pw
    zero = jnp.zeros((), cols.dtype)
    out = jnp.zeros((T, Hp, Wp, C), cols.dtype)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            out = out + jax.lax.pad(
                patches[..., t], zero,
                [(0, 0, 0),
                 (i, Hp - i - (oh - 1) * sh - 1, sh - 1),
                 (j, Wp - j - (ow - 1) * sw - 1, sw - 1),
                 (0, 0, 0)])
    return out[:, ph:ph + H, pw:pw + W]


def soft_split(p: Params, cfg: ProPainterConfig,
               x: jnp.ndarray) -> jnp.ndarray:
    """SoftSplit (sparse_transformer.py:7-31): overlapping unfold +
    linear embedding. x: (T, h, w, c) -> (T, f_h, f_w, hidden)."""
    cols = _unfold(x, cfg.kernel, cfg.stride, cfg.padding)
    return L.linear(p["ss"], cols)


def soft_comp(p: Params, cfg: ProPainterConfig, tokens: jnp.ndarray,
              out_hw) -> jnp.ndarray:
    """SoftComp (sparse_transformer.py:34-62): linear + fold (overlaps
    summed) + 3x3 bias conv."""
    cols = L.linear(p["sc"], tokens)
    x = _fold(cols, out_hw, cfg.kernel, cfg.stride, cfg.padding)
    return L.conv2d(p["sc_bias"], x, padding=1)


def fusion_ff(p: Params, cfg: ProPainterConfig, x: jnp.ndarray,
              out_hw) -> jnp.ndarray:
    """FusionFeedForward (sparse_transformer.py:65-103): fc1 -> fold to a
    spatial map (overlap-summed, normalized by the fold of ones) ->
    unfold back -> GELU -> fc2. x: (T, f_h, f_w, hidden)."""
    T, fh, fw, _ = x.shape
    h = L.linear(p["ff1"], x)                 # (T, fh, fw, ffn_hidden)
    kh, kw = cfg.kernel
    c_mid = cfg.ffn_hidden // (kh * kw)
    # reorder token features to channel-major columns for fold: fc1's
    # output is interpreted as (c_mid * kh * kw) columns directly
    folded = _fold(h, out_hw, cfg.kernel, cfg.stride, cfg.padding)
    ones = jnp.ones((T, fh, fw, kh * kw), h.dtype)
    norm = _fold(ones, out_hw, cfg.kernel, cfg.stride, cfg.padding)
    h = _unfold(folded / norm, cfg.kernel, cfg.stride, cfg.padding)
    h = jax.nn.gelu(h.astype(jnp.float32),
                    approximate=False).astype(h.dtype)
    return L.linear(p["ff2"], h)


# ---------------------------------------------------------------------------
# sparse window attention
# ---------------------------------------------------------------------------


def _roll_masks(window: Tuple[int, int]):
    """valid_ind_rolled construction (sparse_transformer.py:142-153):
    boolean mask over 4 stacked (wh*ww) windows selecting the expanded
    ring tokens."""
    wh, ww = window
    eh, ew = (wh + 1) // 2, (ww + 1) // 2
    tl = np.ones((wh, ww)); tl[:-eh, :-ew] = 0
    tr = np.ones((wh, ww)); tr[:-eh, ew:] = 0
    bl = np.ones((wh, ww)); bl[eh:, :-ew] = 0
    br = np.ones((wh, ww)); br[eh:, ew:] = 0
    return np.stack([tl, tr, bl, br]).reshape(-1).astype(bool)


def sparse_window_attention(p: Params, cfg: ProPainterConfig,
                            x: jnp.ndarray, mask: jnp.ndarray,
                            t_ind: np.ndarray) -> jnp.ndarray:
    """SparseWindowAttention.forward (sparse_transformer.py:158-283).

    x: (T, fh, fw, hidden); mask: (lt, fh, fw, 1) pooled local masks;
    t_ind: static frame indices the keys/values keep (temporal dilation).
    The reference routes masked windows to full (window+ring+pool, all
    kept frames) attention and unmasked windows to per-frame local window
    attention via dynamic indexing; here both paths run for all windows
    and the result is selected per window — identical values, static
    shapes.
    """
    heads = cfg.heads
    wh, ww = cfg.window
    T, fh, fw, c = x.shape
    ch = c // heads
    n_wh, n_ww = -(-fh // wh), -(-fw // ww)
    pad_b, pad_r = n_wh * wh - fh, n_ww * ww - fw
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    H, W = n_wh * wh, n_ww * ww
    nw = n_wh * n_ww

    q = L.linear(p["q"], x)
    k = L.linear(p["k"], x)
    v = L.linear(p["v"], x)

    def windows(a):   # (T, H, W, c) -> (nw, heads, T, wh*ww, ch)
        a = a.reshape(T, n_wh, wh, n_ww, ww, heads, ch)
        return a.transpose(1, 3, 5, 0, 2, 4, 6).reshape(
            nw, heads, T, wh * ww, ch)

    win_q, win_k, win_v = windows(q), windows(k), windows(v)

    # rolled ring keys/values (4 diagonal shifts, ring-masked)
    eh, ew = (wh + 1) // 2, (ww + 1) // 2
    valid = _roll_masks(cfg.window)
    rolls = [(-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)]
    rk, rv = [], []
    for dy, dx in rolls:
        rk.append(windows(jnp.roll(k, (dy, dx), axis=(1, 2))))
        rv.append(windows(jnp.roll(v, (dy, dx), axis=(1, 2))))
    rool_k = jnp.concatenate(rk, axis=3)[:, :, :, valid]
    rool_v = jnp.concatenate(rv, axis=3)[:, :, :, valid]
    k_full = jnp.concatenate([win_k, rool_k], axis=3)
    v_full = jnp.concatenate([win_v, rool_v], axis=3)

    # pooled global tokens: a depthwise strided conv (initialized to mean
    # pooling but trained — its weights live in the checkpoint,
    # sparse_transformer.py:131-137) then key/value proj, shared windows
    ph, pw = cfg.pool
    p_h, p_w = H // ph, W // pw
    pool_x = L.conv2d(p["pool"], x, stride=ph, padding=0, groups=c)
    pool_k = L.linear(p["k"], pool_x).reshape(T, p_h * p_w, heads, ch)
    pool_v = L.linear(p["v"], pool_x).reshape(T, p_h * p_w, heads, ch)
    pool_k = jnp.broadcast_to(pool_k.transpose(2, 0, 1, 3)[None],
                              (nw, heads, T, p_h * p_w, ch))
    pool_v = jnp.broadcast_to(pool_v.transpose(2, 0, 1, 3)[None],
                              (nw, heads, T, p_h * p_w, ch))
    k_full = jnp.concatenate([k_full, pool_k], axis=3)
    v_full = jnp.concatenate([v_full, pool_v], axis=3)

    scale = 1.0 / math.sqrt(ch)

    # masked-window path: queries over all frames, keys over kept frames
    kf = k_full[:, :, t_ind].reshape(nw, heads, -1, ch)
    vf = v_full[:, :, t_ind].reshape(nw, heads, -1, ch)
    qf = win_q.reshape(nw, heads, T * wh * ww, ch)
    att = jax.nn.softmax(
        (qf @ kf.transpose(0, 1, 3, 2)) * scale, axis=-1)
    out_masked = (att @ vf).reshape(nw, heads, T, wh * ww, ch)

    # unmasked-window path: per-frame local window attention
    att_s = jax.nn.softmax(
        jnp.einsum("whtqc,whtkc->whtqk", win_q, win_k) * scale, axis=-1)
    out_plain = jnp.einsum("whtqk,whtkc->whtqc", att_s, win_v)

    # per-window mask flag: window-max-pooled local masks summed over lt
    lt = mask.shape[0]
    mwin = mask.reshape(lt, n_wh, wh, n_ww, ww).max(axis=(2, 4))
    flag = (mwin.sum(axis=0) > 0).reshape(nw)[:, None, None, None, None]
    out = jnp.where(flag, out_masked, out_plain)

    out = out.reshape(n_wh, n_ww, heads, T, wh, ww, ch)
    out = out.transpose(3, 0, 4, 1, 5, 2, 6).reshape(T, H, W, c)
    if pad_b or pad_r:
        out = out[:, :fh, :fw]
    return L.linear(p["proj"], out)


def transformer_block(p: Params, cfg: ProPainterConfig, x: jnp.ndarray,
                      mask: jnp.ndarray, t_ind: np.ndarray,
                      out_hw) -> jnp.ndarray:
    """TemporalSparseTransformer (sparse_transformer.py:285-314)."""
    y = L.layer_norm(p["ln1"], x)
    x = x + sparse_window_attention(p, cfg, y, mask, t_ind)
    y = L.layer_norm(p["ln2"], x)
    return x + fusion_ff(p, cfg, y, out_hw)


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

ENC_GROUPS = (1, 2, 4, 8, 1)
ENC_PLAN = [
    # (cin, cout, stride, groups) — propainter.py Encoder:195-214
    (5, 64, 2, 1),
    (64, 64, 1, 1),
    (64, 128, 2, 1),
    (128, 256, 1, 1),
    (256, 384, 1, 1),
    (640, 512, 1, 2),
    (768, 384, 1, 4),
    (640, 256, 1, 8),
    (512, 128, 1, 1),
]


def _enc_plan(cfg: ProPainterConfig):
    s = cfg.channel / 128.0
    plan = []
    for cin, cout, st, gr in ENC_PLAN:
        plan.append((cin if cin == 5 else int(cin * s), int(cout * s),
                     st, gr))
    return plan


def generator_init(key, cfg: ProPainterConfig) -> Params:
    keys = iter(jax.random.split(key, 48 + 8 * cfg.depths))
    c = cfg.channel
    hid = cfg.hidden
    kh, kw = cfg.kernel
    g = cfg.deform_groups

    enc = [L.conv2d_init(next(keys), 3, 3, cin, cout, groups=gr)
           for (cin, cout, st, gr) in _enc_plan(cfg)]

    blocks = []
    for _ in range(cfg.depths):
        blocks.append({
            "ln1": L.layer_norm_init(hid),
            "q": L.linear_init(next(keys), hid, hid),
            "k": L.linear_init(next(keys), hid, hid),
            "v": L.linear_init(next(keys), hid, hid),
            "proj": L.linear_init(next(keys), hid, hid),
            # depthwise pooling conv, init = mean pooling
            "pool": {"kernel": jnp.full((cfg.pool[0], cfg.pool[1], 1, hid),
                                        1.0 / (cfg.pool[0] * cfg.pool[1])),
                     "bias": jnp.zeros((hid,))},
            "ln2": L.layer_norm_init(hid),
            "ff1": L.linear_init(next(keys), hid, cfg.ffn_hidden),
            "ff2": L.linear_init(next(keys), cfg.ffn_hidden, hid),
        })

    return {
        "enc": enc,
        "ss": L.linear_init(next(keys), c * kh * kw, hid),
        "sc": L.linear_init(next(keys), hid, c * kh * kw),
        "sc_bias": L.conv2d_init(next(keys), 3, 3, c, c),
        "blocks": blocks,
        # learnable feature propagation
        "align_bwd": _deform_align_init(next(keys), c, c, 2 * c + 5, g),
        "align_fwd": _deform_align_init(next(keys), c, c, 2 * c + 5, g),
        "backbone_bwd": [L.conv2d_init(next(keys), 3, 3, 2 * c + 2, c),
                         L.conv2d_init(next(keys), 3, 3, c, c)],
        "backbone_fwd": [L.conv2d_init(next(keys), 3, 3, 2 * c + 2, c),
                         L.conv2d_init(next(keys), 3, 3, c, c)],
        "fuse": [L.conv2d_init(next(keys), 3, 3, 2 * c + 2, c),
                 L.conv2d_init(next(keys), 3, 3, c, c)],
        # decoder (propainter.py:283-291)
        "dec": [L.conv2d_init(next(keys), 3, 3, c, c),
                L.conv2d_init(next(keys), 3, 3, c, c // 2),
                L.conv2d_init(next(keys), 3, 3, c // 2, c // 2),
                L.conv2d_init(next(keys), 3, 3, c // 2, 3)],
    }


def encoder_forward(p: Params, cfg: ProPainterConfig,
                    x: jnp.ndarray) -> jnp.ndarray:
    """Grouped-conv Encoder with the channel re-cat trick
    (propainter.py:218-233). x: (T, H, W, 5)."""
    plan = _enc_plan(cfg)
    out = x
    x0 = None
    for i, (conv, (cin, cout, st, gr)) in enumerate(zip(p["enc"], plan)):
        if i == 4:
            x0 = out
        if i > 4:
            gidx = ENC_GROUPS[i - 4]
            T, h, w, _ = x0.shape
            a = x0.reshape(T, h, w, gidx, -1)
            b = out.reshape(T, h, w, gidx, -1)
            out = jnp.concatenate([a, b], axis=-1).reshape(T, h, w, -1)
        out = _lrelu(L.conv2d(conv, out, stride=st, padding=1, groups=gr))
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "num_local"))
def _inpaint_prepare(p: Params, cfg: ProPainterConfig,
                     masked_frames: jnp.ndarray, flows_f: jnp.ndarray,
                     flows_b: jnp.ndarray, masks_in: jnp.ndarray,
                     masks_updated: jnp.ndarray, num_local: int):
    """Encoder + learnable feature propagation + soft split + token mask."""
    T, H, W, _ = masked_frames.shape
    lt = num_local
    x = jnp.concatenate([masked_frames, masks_in, masks_updated], axis=-1)
    feat = encoder_forward(p, cfg, x)
    h4, w4 = feat.shape[1], feat.shape[2]

    # downscaled flows (bilinear, align_corners=False) and masks (nearest)
    fl_f = jax.image.resize(flows_f, (lt - 1, h4, w4, 2), "bilinear") / 4.0
    fl_b = jax.image.resize(flows_b, (lt - 1, h4, w4, 2), "bilinear") / 4.0
    ds_mask = jax.image.resize(masks_in, (T, h4, w4, 1), "nearest")
    ds_mask_l = ds_mask[:lt]
    ds_upd_l = jax.image.resize(masks_updated[:lt], (lt, h4, w4, 1),
                                "nearest")

    local = feat_propagation(
        p, cfg, feat[:lt], fl_f, fl_b,
        jnp.concatenate([ds_mask_l, ds_upd_l], axis=-1))
    feat = jnp.concatenate([local, feat[lt:]], axis=0)

    # token-grid mask: MaxPool2d(kernel, stride, padding) on local masks
    kh, kw = cfg.kernel
    sh, sw = cfg.stride
    ph, pw = cfg.padding
    mp = jnp.pad(ds_mask_l, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                 constant_values=-jnp.inf)
    mask_pool = jax.lax.reduce_window(
        mp, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1), "VALID")

    tokens = soft_split(p, cfg, feat)
    return feat, tokens, mask_pool


@functools.partial(jax.jit, static_argnames=("cfg", "t_ind", "out_hw"))
def _inpaint_block(blk: Params, cfg: ProPainterConfig, tokens: jnp.ndarray,
                   mask_pool: jnp.ndarray, t_ind, out_hw):
    return transformer_block(blk, cfg, tokens, mask_pool,
                             np.asarray(t_ind), out_hw)


@functools.partial(jax.jit, static_argnames=("cfg", "num_local"))
def _inpaint_decode(p: Params, cfg: ProPainterConfig, feat: jnp.ndarray,
                    tokens: jnp.ndarray, num_local: int) -> jnp.ndarray:
    h4, w4 = feat.shape[1], feat.shape[2]
    feat = feat + soft_comp(p, cfg, tokens, (h4, w4))
    d = feat[:num_local]
    d = _lrelu(L.conv2d(p["dec"][0], _align_corners_2x(d), padding=1))
    d = _lrelu(L.conv2d(p["dec"][1], d, padding=1))
    d = _lrelu(L.conv2d(p["dec"][2], _align_corners_2x(d), padding=1))
    return jnp.tanh(L.conv2d(p["dec"][3], d, padding=1))


def inpaint_forward(p: Params, cfg: ProPainterConfig,
                    masked_frames: jnp.ndarray, flows_f: jnp.ndarray,
                    flows_b: jnp.ndarray, masks_in: jnp.ndarray,
                    masks_updated: jnp.ndarray,
                    num_local: int) -> jnp.ndarray:
    """InpaintGenerator.forward (propainter.py:324-372): encode local +
    reference frames, learnable feature propagation on the local window,
    sparse transformer over everything, decode the local frames.

    Three jitted pieces driven from the host (round 5). Eager, the
    fold/unfold tap loops were ~1200 dispatches/window x ~35 ms tunnel
    latency (the round-4 ledger's 68 s/window); ONE whole-window jit
    (round 4's untested fix) OOMs at COMPILE on a 16 GB v5e — XLA
    schedules a 22.9 GB live set for the 15-frame window program. The
    split keeps each program's live set small, compiles ~10 dispatches
    per window instead of ~1200, and the per-block jit compiles ONCE per
    temporal-dilation parity (2 programs reused across all 8 blocks and
    every window)."""
    feat, tokens, mask_pool = _inpaint_prepare(
        p, cfg, masked_frames, flows_f, flows_b, masks_in, masks_updated,
        num_local)
    T = masked_frames.shape[0]
    h4, w4 = feat.shape[1], feat.shape[2]
    t_inds = [tuple(range(i, T, cfg.t_dilation))
              for i in range(cfg.t_dilation)]
    for i, blk in enumerate(p["blocks"]):
        tokens = _inpaint_block(blk, cfg, tokens, mask_pool,
                                t_inds[i % cfg.t_dilation], (h4, w4))
    return _inpaint_decode(p, cfg, feat, tokens, num_local)


# ---------------------------------------------------------------------------
# end-to-end orchestration (infer.py:380-564)
# ---------------------------------------------------------------------------


def _get_ref_index(mid, neighbor_ids, length, ref_stride, ref_num):
    """infer.py get_ref_index: every ref_stride-th frame outside the
    neighborhood, optionally capped around mid."""
    ref = []
    if ref_num == -1:
        for i in range(0, length, ref_stride):
            if i not in neighbor_ids:
                ref.append(i)
    else:
        start = max(0, mid - ref_stride * (ref_num // 2))
        end = min(length, mid + ref_stride * (ref_num // 2))
        for i in range(start, end, ref_stride):
            if i not in neighbor_ids:
                ref.append(i)
                if len(ref) > ref_num:
                    break
    return ref


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _blend_window(comp, seen, pred, frames01, masks, start):
    """Blend one sliding window's prediction into the running composite,
    entirely on device (infer.py:544-556 semantics: mask-composite the
    prediction over the source frame, 0.5/0.5 cross-fade where a previous
    window already wrote). The host loop this replaces downloaded every
    window's ~60 MB f32 prediction through the ~10 MB/s tunnel (~60 s per
    48f clip) and re-uploaded the blended result."""
    lt = pred.shape[0]
    pred01 = (pred.astype(jnp.float32) + 1.0) * 0.5
    c = jax.lax.dynamic_slice_in_dim(comp, start, lt, 0)
    s = jax.lax.dynamic_slice_in_dim(seen, start, lt, 0)
    fr = jax.lax.dynamic_slice_in_dim(frames01, start, lt, 0)
    m = jax.lax.dynamic_slice_in_dim(masks, start, lt, 0)
    m = m.astype(jnp.float32)
    img = pred01 * m + fr.astype(jnp.float32) * (1.0 - m)
    new = jnp.where(s > 0, 0.5 * c + 0.5 * img, img)
    comp = jax.lax.dynamic_update_slice_in_dim(comp, new, start, 0)
    seen = jax.lax.dynamic_update_slice_in_dim(seen, jnp.ones_like(s),
                                               start, 0)
    return comp, seen


def inpaint_video(params: Params, cfg: ProPainterConfig,
                  raft_params: Params, raft_cfg,
                  frames01: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """frames01: (T, H, W, 3) in [0,1]; masks: (T, H, W, 1) 1=remove.
    Returns inpainted frames in [0,1]. H/W multiples of 8.

    Full reference orchestration: RAFT width-chunked, flow completion in
    subvideo chunks (pad 5), image propagation chunks (pad 10), then the
    neighbor/ref sliding window with 0.5/0.5 overlap blending."""
    from mimo_tpu.decomp.raft import raft_bi, raft_flow

    T, H, W, _ = frames01.shape
    frames = frames01 * 2.0 - 1.0

    def _phase(name, *sync):
        """PP_DEBUG=1: force-sync the listed arrays and log the phase —
        under the async axon runtime an OOM otherwise surfaces at a later
        unrelated op (round-4 ledger debugging)."""
        if os.environ.get("PP_DEBUG"):
            import sys as _sys
            import time as _time
            for s in sync:
                float(jnp.sum(s.astype(jnp.float32)[..., :1, :1]))
            print(f"# pp[{_time.time():.0f}] {name}", file=_sys.stderr,
                  flush=True)

    # ---- RAFT on width-dependent clips (infer.py:407-439) ----
    if W <= 640:
        clip = 12
    elif W <= 720:
        clip = 8
    elif W <= 1280:
        clip = 4
    else:
        clip = 2
    if T > clip:
        ff, bb = [], []
        for f in range(0, T, clip):
            e = min(T, f + clip)
            s = f if f == 0 else f - 1
            fw, bw = raft_bi(raft_params, raft_cfg, frames[s:e])
            ff.append(fw)
            bb.append(bw)
        flows_f = jnp.concatenate(ff, axis=0)
        flows_b = jnp.concatenate(bb, axis=0)
    else:
        flows_f, flows_b = raft_bi(raft_params, raft_cfg, frames)

    _phase("raft", flows_f, flows_b)

    # ---- flow completion in subvideo chunks (infer.py:447-475) ----
    # The reference chunks only above subvideo_length=80 (sized for a
    # 24 GB GPU). The flow-completion decoder holds several
    # (T, H, W, 32) tensors live, so on a 16 GB v5e the chunk must also
    # scale with resolution: ~47 frames at 720×480 OOMed (round-4
    # ledger). Same pad-5 overlap stitching as the reference.
    FL = T - 1
    fc_chunk = max(8, min(cfg.subvideo_length,
                          int(2.4e9 // (H * W * 500))))
    if FL > fc_chunk:
        pf, pb = [], []
        pad = 5
        for f in range(0, FL, fc_chunk):
            s_f = max(0, f - pad)
            e_f = min(FL, f + fc_chunk + pad)
            ps = f - s_f
            pe = e_f - min(FL, f + fc_chunk)
            of, ob = forward_bidirect_flow(
                params["flow"], cfg, flows_f[s_f:e_f], flows_b[s_f:e_f],
                masks[s_f:e_f + 1])
            pf.append(of[ps:e_f - s_f - pe])
            pb.append(ob[ps:e_f - s_f - pe])
        flows_f = jnp.concatenate(pf, axis=0)
        flows_b = jnp.concatenate(pb, axis=0)
    else:
        flows_f, flows_b = forward_bidirect_flow(
            params["flow"], cfg, flows_f, flows_b, masks)

    _phase("flow_complete", flows_f, flows_b)

    # ---- image propagation in chunks (infer.py:487-520) ----
    masked = frames * (1 - masks)
    sub_img = min(100, cfg.subvideo_length)
    if T > sub_img:
        uf, um = [], []
        pad = 10
        for f in range(0, T, sub_img):
            s_f = max(0, f - pad)
            e_f = min(T, f + sub_img + pad)
            ps = f - s_f
            pe = e_f - min(T, f + sub_img)
            pi, pm = img_propagation(
                masked[s_f:e_f], flows_f[s_f:e_f - 1],
                flows_b[s_f:e_f - 1], masks[s_f:e_f])
            fi = frames[s_f:e_f] * (1 - masks[s_f:e_f]) \
                + pi * masks[s_f:e_f]
            uf.append(fi[ps:e_f - s_f - pe])
            um.append(pm[ps:e_f - s_f - pe])
        upd_frames = jnp.concatenate(uf, axis=0)
        upd_masks = jnp.concatenate(um, axis=0)
    else:
        pi, pm = img_propagation(masked, flows_f, flows_b, masks)
        upd_frames = frames * (1 - masks) + pi * masks
        upd_masks = pm

    _phase("img_propagation", upd_frames, upd_masks)

    # ---- sliding neighbor/ref window + 0.5/0.5 blend (infer.py:522-560)
    stride = cfg.neighbor_length // 2
    ref_num = cfg.subvideo_length // cfg.ref_stride \
        if T > cfg.subvideo_length else -1

    # Everything stays on device: each window program is followed by a
    # tiny jitted blend update into the (T, H, W, 3) f32 composite (one
    # program per distinct edge-window length). Nothing downloads until
    # the caller fetches the final composite — the previous host blend
    # pulled ~60 MB f32 per window through the ~10 MB/s tunnel and then
    # re-uploaded the stacked result.
    comp = jnp.zeros((T, H, W, 3), jnp.float32)
    seen = jnp.zeros((T, 1, 1, 1), jnp.float32)
    frames01_dev = jnp.asarray(frames01)
    for f in range(0, T, stride):
        neighbor_ids = list(range(max(0, f - stride),
                                  min(T, f + stride + 1)))
        ref_ids = _get_ref_index(f, neighbor_ids, T, cfg.ref_stride,
                                 ref_num)
        sel = neighbor_ids + ref_ids
        lt = len(neighbor_ids)
        sel_flows_f = flows_f[jnp.asarray(neighbor_ids[:-1])]
        sel_flows_b = flows_b[jnp.asarray(neighbor_ids[:-1])]
        sidx = jnp.asarray(sel)
        pred = inpaint_forward(
            params["gen"], cfg, upd_frames[sidx], sel_flows_f,
            sel_flows_b, masks[sidx], upd_masks[sidx], lt)
        _phase(f"inpaint_forward f={f}", pred)
        comp, seen = _blend_window(comp, seen, pred, frames01_dev,
                                   masks, neighbor_ids[0])
    return jnp.clip(comp, 0.0, 1.0)


def propainter_init(key, cfg: ProPainterConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {"flow": flow_complete_init(k1, cfg),
            "gen": generator_init(k2, cfg)}
