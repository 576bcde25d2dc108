"""ProPainter video inpainting, JAX/TPU: recurrent flow completion →
flow-guided image propagation → temporal sparse-window transformer.

Reference: video_decomp/ProPainter/ (12.3k LoC):
- `Propainter.process` orchestration (infer.py:339-564): RAFT bidirectional
  flows (chunked), flow completion (subvideo_length=80 chunks), image
  propagation, sparse transformer over neighbor+ref frames
  (neighbor_stride, ref_stride=10), 0.5/0.5 overlap blending.
- `RecurrentFlowCompleteNet` (model/recurrent_flow_completion.py, P3D
  encoder + SecondOrderDeformableAlignment propagation + decoder).
- `InpaintGenerator` (model/propainter.py:256): Encoder (:193),
  SoftSplit/SoftComp patch (un)folding (modules/sparse_transformer.py:7,34),
  `TemporalSparseTransformerBlock` window attention (:117,317), flow-guided
  `DeformableAlignment` (model/propainter.py:34) — the CUDA deform_conv2d
  becomes ops/sampling.deform_conv2d (gather + one matmul).

TPU-native notes: time-recurrent propagation is a `lax.scan` over frames;
everything per-frame batches over the frame axis; window attention reshapes
to (windows, tokens) and runs one batched SDPA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.models import layers as L
from mimo_tpu.ops.sampling import deform_conv2d, flow_warp

Params = Dict[str, Any]


@dataclass(frozen=True)
class ProPainterConfig:
    enc_dim: int = 128          # generator feature channels at 1/4 res
    flow_dim: int = 64          # flow-completion feature channels at 1/8
    window: Tuple[int, int] = (5, 9)
    num_tf_blocks: int = 8
    tf_heads: int = 4
    tf_dim: int = 512
    patch: Tuple[int, int] = (3, 3)  # soft-split kernel at 1/4 res
    neighbor_length: int = 10
    ref_stride: int = 10
    subvideo_length: int = 80


def tiny_propainter_config() -> ProPainterConfig:
    return ProPainterConfig(enc_dim=16, flow_dim=8, window=(2, 2),
                            num_tf_blocks=1, tf_heads=2, tf_dim=32,
                            patch=(3, 3), neighbor_length=4, ref_stride=4,
                            subvideo_length=8)


# ---------------------------------------------------------------------------
# flow completion
# ---------------------------------------------------------------------------


def flow_complete_init(key, cfg: ProPainterConfig) -> Params:
    keys = iter(jax.random.split(key, 24))
    d = cfg.flow_dim
    return {
        # encoder on (flow ‖ mask): 3ch -> d at 1/4
        "e1": L.conv2d_init(next(keys), 3, 3, 3, d // 2),
        "e2": L.conv2d_init(next(keys), 3, 3, d // 2, d // 2),
        "e3": L.conv2d_init(next(keys), 3, 3, d // 2, d),
        "e4": L.conv2d_init(next(keys), 3, 3, d, d),
        # bidirectional propagation: offset net + deform kernel per direction
        "prop": {
            dirn: {
                "offset": L.conv2d_init(next(keys), 3, 3, 2 * d, 27,
                                        zero=True),
                "deform_k": jax.random.normal(next(keys), (3, 3, d, d))
                * (1.0 / np.sqrt(9 * d)),
                "deform_b": jnp.zeros((d,)),
                "fuse": L.conv2d_init(next(keys), 3, 3, 2 * d, d),
            } for dirn in ("fwd", "bwd")
        },
        # decoder back to flow at full res
        "d1": L.conv2d_init(next(keys), 3, 3, 3 * d, d),
        "d2": L.conv2d_init(next(keys), 3, 3, d, d // 2),
        "d3": L.conv2d_init(next(keys), 3, 3, d // 2, 2),
    }


def _propagate(prop_p: Params, feats: jnp.ndarray,
               reverse: bool) -> jnp.ndarray:
    """Recurrent deformable propagation over the time axis.
    feats: (T, h, w, d). Mirrors SecondOrderDeformableAlignment's role
    (first-order here: one deformable warp of the previous propagated
    state, offsets predicted from [cur ‖ prev])."""
    seq = feats[::-1] if reverse else feats

    def step(prev, cur):
        both = jnp.concatenate([cur, prev], axis=-1)[None]
        off_mask = L.conv2d(prop_p["offset"], both, padding=1)
        off, mask_logit = off_mask[..., :18], off_mask[..., 18:]
        aligned = deform_conv2d(prev[None], off,
                                prop_p["deform_k"],
                                prop_p["deform_b"],
                                mask=jax.nn.sigmoid(mask_logit))
        fused = L.conv2d(prop_p["fuse"],
                         jnp.concatenate([cur[None], aligned], axis=-1),
                         padding=1)
        out = jax.nn.leaky_relu(fused[0], 0.2)
        return out, out

    _, outs = jax.lax.scan(step, seq[0], seq)
    return outs[::-1] if reverse else outs


def complete_flow(p: Params, cfg: ProPainterConfig, flow: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """flow: (T, H, W, 2) with holes; mask: (T, H, W, 1) in {0,1} (1 =
    missing). Returns completed flow (T, H, W, 2). The completed values
    replace only masked regions (reference forward_bidirect_flow)."""
    x = jnp.concatenate([flow / 10.0, mask], axis=-1)
    h = jax.nn.leaky_relu(L.conv2d(p["e1"], x, stride=2, padding=1), 0.2)
    h = jax.nn.leaky_relu(L.conv2d(p["e2"], h, padding=1), 0.2)
    h = jax.nn.leaky_relu(L.conv2d(p["e3"], h, stride=2, padding=1), 0.2)
    h = jax.nn.leaky_relu(L.conv2d(p["e4"], h, padding=1), 0.2)

    f_fwd = _propagate(p["prop"]["fwd"], h, reverse=False)
    f_bwd = _propagate(p["prop"]["bwd"], h, reverse=True)
    h = jnp.concatenate([h, f_fwd, f_bwd], axis=-1)

    h = jax.nn.leaky_relu(L.conv2d(p["d1"], h, padding=1), 0.2)
    h = L.upsample_nearest_2x(h)
    h = jax.nn.leaky_relu(L.conv2d(p["d2"], h, padding=1), 0.2)
    h = L.upsample_nearest_2x(h)
    pred = L.conv2d(p["d3"], h, padding=1) * 10.0
    return flow * (1 - mask) + pred * mask


# ---------------------------------------------------------------------------
# image propagation (flow-guided pixel fill)
# ---------------------------------------------------------------------------


def propagate_images(frames: jnp.ndarray, masks: jnp.ndarray,
                     flow_fwd: jnp.ndarray, flow_bwd: jnp.ndarray,
                     valid_thresh: float = 0.5):
    """Fill masked pixels by warping temporal neighbors along completed
    flows, forward then backward pass (reference img_propagation /
    ProPainter image propagation stage).

    frames: (T, H, W, 3) in [-1,1]; masks: (T, H, W, 1) 1=hole;
    flow_fwd[t] maps frame t -> t+1; flow_bwd[t] maps t+1 -> t.
    Returns (filled frames, remaining masks).
    """

    def fwd_step(carry, inp):
        prev_img, prev_mask = carry
        img, mask, flow = inp       # flow: bwd flow t<-t+1 ... see call
        warped = flow_warp(prev_img[None], flow[None])[0]
        warped_mask = flow_warp(prev_mask[None], flow[None])[0]
        ok = (warped_mask < valid_thresh).astype(img.dtype)
        fill = mask * ok
        new_img = img * (1 - fill) + warped * fill
        new_mask = mask * (1 - ok)
        return (new_img, new_mask), (new_img, new_mask)

    # forward pass: t receives from t-1 via flow_bwd? warp(prev, flow) with
    # flow mapping current->prev: use flow_bwd[t-1] (maps t -> t-1).
    T = frames.shape[0]
    (_, _), (f_imgs, f_masks) = jax.lax.scan(
        fwd_step, (frames[0], masks[0]),
        (frames[1:], masks[1:], flow_bwd))
    imgs1 = jnp.concatenate([frames[:1], f_imgs], axis=0)
    masks1 = jnp.concatenate([masks[:1], f_masks], axis=0)

    # backward pass
    (_, _), (b_imgs, b_masks) = jax.lax.scan(
        fwd_step, (imgs1[-1], masks1[-1]),
        (imgs1[:-1][::-1], masks1[:-1][::-1], flow_fwd[::-1]))
    imgs2 = jnp.concatenate([b_imgs[::-1], imgs1[-1:]], axis=0)
    masks2 = jnp.concatenate([b_masks[::-1], masks1[-1:]], axis=0)
    return imgs2, masks2


# ---------------------------------------------------------------------------
# sparse window transformer generator
# ---------------------------------------------------------------------------


def generator_init(key, cfg: ProPainterConfig) -> Params:
    keys = iter(jax.random.split(key, 16 + 8 * cfg.num_tf_blocks))
    d = cfg.enc_dim
    td = cfg.tf_dim
    ph, pw = cfg.patch
    blocks = []
    for _ in range(cfg.num_tf_blocks):
        blocks.append({
            "ln1": L.layer_norm_init(td),
            "attn": L.mha_init(next(keys), td),
            "ln2": L.layer_norm_init(td),
            "ff": L.geglu_ff_init(next(keys), td, mult=2),
        })
    return {
        "enc1": L.conv2d_init(next(keys), 3, 3, 5, d // 2),   # rgb+mask+upd
        "enc2": L.conv2d_init(next(keys), 3, 3, d // 2, d),
        "enc3": L.conv2d_init(next(keys), 3, 3, d, d),
        "soft_split": L.linear_init(next(keys), d * ph * pw, td),
        "blocks": blocks,
        "soft_comp": L.linear_init(next(keys), td, d * ph * pw),
        "dec1": L.conv2d_init(next(keys), 3, 3, d, d // 2),
        "dec2": L.conv2d_init(next(keys), 3, 3, d // 2, 3),
    }


def _soft_split(p, x, patch):
    """(T, h, w, d) -> tokens (T, gh, gw, td): overlapping unfold with
    stride = patch//2-ish; we use stride = patch (non-overlap) + SAME pad —
    a TPU-friendlier tiling than the reference's 50%-overlap unfold
    (sparse_transformer.py:7-33); soft_comp mirrors it exactly."""
    ph, pw = patch
    T, h, w, d = x.shape
    pad_h = (-h) % ph
    pad_w = (-w) % pw
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    gh, gw = (h + pad_h) // ph, (w + pad_w) // pw
    x = x.reshape(T, gh, ph, gw, pw, d).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(T, gh, gw, ph * pw * d)
    return L.linear(p["soft_split"], x), (gh, gw, pad_h, pad_w)


def _soft_comp(p, tokens, patch, d, meta):
    ph, pw = patch
    gh, gw, pad_h, pad_w = meta
    T = tokens.shape[0]
    x = L.linear(p["soft_comp"], tokens)
    x = x.reshape(T, gh, gw, ph, pw, d).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(T, gh * ph, gw * pw, d)
    if pad_h:
        x = x[:, :-pad_h]
    if pad_w:
        x = x[:, :, :-pad_w]
    return x


def _window_attn(blk, tokens, window, heads):
    """tokens: (T, gh, gw, td). Temporal-spatial window attention: each
    (wh, ww) spatial window attends over ALL frames in that window
    (TemporalSparseTransformerBlock semantics, sparse_transformer.py:117)."""
    T, gh, gw, td = tokens.shape
    wh, ww = window
    pad_h = (-gh) % wh
    pad_w = (-gw) % ww
    x = jnp.pad(tokens, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    GH, GW = gh + pad_h, gw + pad_w
    nh, nw = GH // wh, GW // ww
    x = x.reshape(T, nh, wh, nw, ww, td).transpose(1, 3, 0, 2, 4, 5)
    x = x.reshape(nh * nw, T * wh * ww, td)

    y = L.layer_norm(blk["ln1"], x)
    x = x + L.mha(blk["attn"], y, None, heads)
    y = L.layer_norm(blk["ln2"], x)
    x = x + L.geglu_ff(blk["ff"], y)

    x = x.reshape(nh, nw, T, wh, ww, td).transpose(2, 0, 3, 1, 4, 5)
    x = x.reshape(T, GH, GW, td)
    if pad_h:
        x = x[:, :-pad_h]
    if pad_w:
        x = x[:, :, :-pad_w]
    return x


def inpaint_generate(p: Params, cfg: ProPainterConfig, frames: jnp.ndarray,
                     masks: jnp.ndarray, prop_frames: jnp.ndarray,
                     upd_masks: jnp.ndarray) -> jnp.ndarray:
    """frames/prop_frames: (T, H, W, 3) [-1,1]; masks/upd_masks (T, H, W, 1).
    Returns inpainted frames (T, H, W, 3) in [-1, 1]."""
    x = jnp.concatenate([prop_frames, masks, upd_masks], axis=-1)
    h = jax.nn.leaky_relu(L.conv2d(p["enc1"], x, stride=2, padding=1), 0.2)
    h = jax.nn.leaky_relu(L.conv2d(p["enc2"], h, stride=2, padding=1), 0.2)
    h = jax.nn.leaky_relu(L.conv2d(p["enc3"], h, padding=1), 0.2)

    tokens, meta = _soft_split(p, h, cfg.patch)
    for blk in p["blocks"]:
        tokens = _window_attn(blk, tokens, cfg.window, cfg.tf_heads)
    h = h + _soft_comp(p, tokens, cfg.patch, cfg.enc_dim, meta)

    h = L.upsample_nearest_2x(h)
    h = jax.nn.leaky_relu(L.conv2d(p["dec1"], h, padding=1), 0.2)
    h = L.upsample_nearest_2x(h)
    out = jnp.tanh(L.conv2d(p["dec2"], h, padding=1))
    # composite: generated content only in holes
    return prop_frames * (1 - masks) + out * masks


# ---------------------------------------------------------------------------
# end-to-end inpaint (per sub-video; host orchestrates chunking)
# ---------------------------------------------------------------------------


def inpaint_video(params: Params, cfg: ProPainterConfig,
                  raft_params: Params, raft_cfg,
                  frames01: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """frames01: (T, H, W, 3) in [0,1]; masks: (T, H, W, 1) 1=remove.
    Returns inpainted frames in [0,1]. H/W multiples of 8."""
    from mimo_tpu.decomp.raft import raft_bi

    frames = frames01 * 2.0 - 1.0
    masked = frames * (1 - masks)

    fwd, bwd = raft_bi(raft_params, raft_cfg, masked)
    pair_mask = jnp.maximum(masks[:-1], masks[1:])
    fwd = complete_flow(params["flow"], cfg, fwd, pair_mask)
    bwd = complete_flow(params["flow"], cfg, bwd, pair_mask)

    prop, upd = propagate_images(masked, masks, fwd, bwd)
    out = inpaint_generate(params["gen"], cfg, frames, masks, prop, upd)
    return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)


def propainter_init(key, cfg: ProPainterConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {"flow": flow_complete_init(k1, cfg),
            "gen": generator_init(k2, cfg)}
