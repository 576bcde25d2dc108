"""CLIP vision tower + projection (CLIPVisionModelWithProjection role).

The reference encodes the 224x224 reference image once per generation and
uses only the projected pooled embedding (`image_embeds`, run_edit.py:93-95,
pipeline...roiclip.py:378-391). Architecture: ViT-L/14 — patch conv (no
bias), class token, learned position embeddings, pre-LN, 24 transformer
layers (LN→MHA(qkv+out with bias)→res, LN→MLP(quick_gelu)→res), post-LN on
the CLS token, linear projection (no bias) to 768.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mimo_tpu.config import CLIPVisionConfig
from mimo_tpu.models import layers as L

Params = Dict[str, Any]


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def clip_vision_init(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    layers_p = []
    for _ in range(cfg.num_layers):
        k1, k2, k3, k4, k5, k6 = (next(keys) for _ in range(6))
        layers_p.append({
            "ln1": L.layer_norm_init(d, dtype),
            "q": L.linear_init(k1, d, d, dtype=dtype),
            "k": L.linear_init(k2, d, d, dtype=dtype),
            "v": L.linear_init(k3, d, d, dtype=dtype),
            "out": L.linear_init(k4, d, d, dtype=dtype),
            "ln2": L.layer_norm_init(d, dtype),
            "fc1": L.linear_init(k5, d, 4 * d, dtype=dtype),
            "fc2": L.linear_init(k6, 4 * d, d, dtype=dtype),
        })
    return {
        "patch_embed": {"kernel": jax.random.normal(
            next(keys), (cfg.patch_size, cfg.patch_size, 3, d), dtype) * 0.02},
        "class_embed": jax.random.normal(next(keys), (d,), dtype) * 0.02,
        "pos_embed": jax.random.normal(next(keys), (n_pos, d), dtype) * 0.02,
        "pre_ln": L.layer_norm_init(d, dtype),
        "layers": layers_p,
        "post_ln": L.layer_norm_init(d, dtype),
        "projection": L.linear_init(next(keys), d, cfg.projection_dim,
                                    bias=False, dtype=dtype),
    }


def clip_image_embed(p: Params, cfg: CLIPVisionConfig,
                     pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: (B, 224, 224, 3), already CLIP-normalized. Returns
    (B, projection_dim) image_embeds."""
    b = pixels.shape[0]
    d = cfg.hidden_size
    h = jax.lax.conv_general_dilated(
        pixels, p["patch_embed"]["kernel"].astype(pixels.dtype),
        (cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = h.reshape(b, -1, d)
    cls = jnp.broadcast_to(p["class_embed"].astype(h.dtype)[None, None],
                           (b, 1, d))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + p["pos_embed"].astype(h.dtype)[None]
    h = L.layer_norm(p["pre_ln"], h, cfg.layer_norm_eps)

    for lp in p["layers"]:
        y = L.layer_norm(lp["ln1"], h, cfg.layer_norm_eps)
        q = L.linear(lp["q"], y)
        k = L.linear(lp["k"], y)
        v = L.linear(lp["v"], y)
        o = L.sdpa(q, k, v, cfg.num_heads)
        h = h + L.linear(lp["out"], o)
        y = L.layer_norm(lp["ln2"], h, cfg.layer_norm_eps)
        y = _quick_gelu(L.linear(lp["fc1"], y))
        h = h + L.linear(lp["fc2"], y)

    pooled = L.layer_norm(p["post_ln"], h[:, 0], cfg.layer_norm_eps)
    return L.linear(p["projection"], pooled)


# CLIP preprocessing constants (CLIPImageProcessor defaults)
CLIP_MEAN = jnp.array([0.48145466, 0.4578275, 0.40821073], jnp.float32)
CLIP_STD = jnp.array([0.26862954, 0.26130258, 0.27577711], jnp.float32)


def clip_preprocess(images01: jnp.ndarray) -> jnp.ndarray:
    """images01: (B, 224, 224, 3) in [0, 1] -> normalized."""
    return (images01 - CLIP_MEAN) / CLIP_STD
