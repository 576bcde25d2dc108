"""Numerical parity of primitives vs CPU torch (the reference's substrate)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mimo_tpu.models import layers  # noqa: E402


RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_linear_matches_torch():
    x = rand(3, 7, 16)
    p = {"kernel": jnp.asarray(rand(16, 24)), "bias": jnp.asarray(rand(24))}
    got = np.asarray(layers.linear(p, jnp.asarray(x)))
    want = F.linear(torch.tensor(x), torch.tensor(np.asarray(p["kernel"]).T),
                    torch.tensor(np.asarray(p["bias"]))).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv2d_matches_torch(stride):
    x = rand(2, 9, 11, 5)  # NHWC
    k = rand(3, 3, 5, 8)   # HWIO
    b = rand(8)
    p = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    got = np.asarray(layers.conv2d(p, jnp.asarray(x), stride=stride, padding=1))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    kt = torch.tensor(k).permute(3, 2, 0, 1)  # OIHW
    want = F.conv2d(xt, kt, torch.tensor(b), stride=stride, padding=1)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_group_norm_matches_torch():
    n, h, w, c, groups = 2, 6, 5, 16, 4
    x = rand(n, h, w, c)
    scale, bias = rand(c), rand(c)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    got = np.asarray(layers.group_norm(p, jnp.asarray(x), groups, eps=1e-5))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    want = F.group_norm(xt, groups, torch.tensor(scale), torch.tensor(bias),
                        eps=1e-5).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_group_norm_video_folding():
    """GroupNorm on (B*F, H, W, C) == per-frame GroupNorm (InflatedGroupNorm
    semantics, reference resnet.py:20-28)."""
    b, f, h, w, c = 2, 3, 4, 4, 8
    x = rand(b * f, h, w, c)
    p = {"scale": jnp.ones(c), "bias": jnp.zeros(c)}
    got = np.asarray(layers.group_norm(p, jnp.asarray(x), 4))
    per_frame = np.stack([
        np.asarray(layers.group_norm(p, jnp.asarray(x[i:i + 1]), 4))[0]
        for i in range(b * f)
    ])
    np.testing.assert_allclose(got, per_frame, atol=1e-5)


def test_layer_norm_matches_torch():
    x = rand(4, 10, 32)
    scale, bias = rand(32), rand(32)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    got = np.asarray(layers.layer_norm(p, jnp.asarray(x)))
    want = F.layer_norm(torch.tensor(x), (32,), torch.tensor(scale),
                        torch.tensor(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sdpa_matches_torch():
    b, sq, sk, heads, d = 2, 6, 9, 4, 8
    inner = heads * d
    q, k, v = rand(b, sq, inner), rand(b, sk, inner), rand(b, sk, inner)
    got = np.asarray(layers.sdpa(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), heads))
    qt = torch.tensor(q).reshape(b, sq, heads, d).permute(0, 2, 1, 3)
    kt = torch.tensor(k).reshape(b, sk, heads, d).permute(0, 2, 1, 3)
    vt = torch.tensor(v).reshape(b, sk, heads, d).permute(0, 2, 1, 3)
    want = F.scaled_dot_product_attention(qt, kt, vt)
    want = want.permute(0, 2, 1, 3).reshape(b, sq, inner).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_geglu_ff_matches_torch():
    dim = 16
    x = rand(2, 5, dim)
    key = jax.random.PRNGKey(0)
    p = layers.geglu_ff_init(key, dim)
    got = np.asarray(layers.geglu_ff(p, jnp.asarray(x)))
    # torch replica of diffusers FeedForward(GEGLU)
    w1 = torch.tensor(np.asarray(p["proj_in"]["kernel"]))
    b1 = torch.tensor(np.asarray(p["proj_in"]["bias"]))
    w2 = torch.tensor(np.asarray(p["proj_out"]["kernel"]))
    b2 = torch.tensor(np.asarray(p["proj_out"]["bias"]))
    h = torch.tensor(x) @ w1 + b1
    h, gate = h.chunk(2, dim=-1)
    h = h * F.gelu(gate)
    want = (h @ w2 + b2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)
    t = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float32)
    dim = 32
    got = np.asarray(layers.sinusoidal_timestep_embedding(jnp.asarray(t), dim))
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    emb = t[:, None] * np.exp(exponent)[None, :]
    want = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
    # XLA and numpy trig differ slightly at large args (t≈1000)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_upsample_nearest_matches_torch():
    x = rand(2, 3, 5, 4)
    got = np.asarray(layers.upsample_nearest_2x(jnp.asarray(x)))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, scale_factor=2.0, mode="nearest")
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_attention_bf16_runs():
    key = jax.random.PRNGKey(1)
    p = layers.mha_init(key, 32, context_dim=48)
    x = jnp.asarray(rand(2, 7, 32), dtype=jnp.bfloat16)
    ctx = jnp.asarray(rand(2, 3, 48), dtype=jnp.bfloat16)
    y = layers.mha(p, x, ctx, heads=4)
    assert y.shape == (2, 7, 32)
    assert y.dtype == jnp.bfloat16
