"""Fused temporal-attention kernel vs the einsum formulation (interpret
mode on CPU). The rolled-lane indexing is the tricky part: diagonal r of
the logits pairs query frame f with key frame (f+r) mod F — validated
against the plain einsum path for ragged S (edge s-blocks) and several
(F, heads, C) combinations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.models import layers as L
from mimo_tpu.models import unet as U
from mimo_tpu.ops import temporal_attention as T


def _einsum_ref(p_attn, x_norm, frames, heads):
    b, f, s, c = x_norm.shape
    d = c // heads
    q = L.linear(p_attn["to_q"], x_norm).reshape(b, f, s, heads, d)
    k = L.linear(p_attn["to_k"], x_norm).reshape(b, f, s, heads, d)
    v = L.linear(p_attn["to_v"], x_norm).reshape(b, f, s, heads, d)
    logits = jnp.einsum("bfshd,bgshd->bhfgs", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    w = jax.nn.softmax(logits, axis=3).astype(x_norm.dtype)
    o = jnp.einsum("bhfgs,bgshd->bfshd", w, v).reshape(b, f, s, c)
    return L.linear(p_attn["to_out"], o)


@pytest.mark.parametrize("b,f,s,c,heads", [
    (2, 8, 48, 64, 4),     # ragged s (48 not a multiple of the block)
    (1, 16, 32, 32, 2),
    (1, 6, 100, 48, 3),    # F with gcd(F,128)=2 -> bs step 64, ragged tail
])
def test_fused_matches_einsum(b, f, s, c, heads):
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    p = L.mha_init(key, c)
    x = jnp.asarray(rng.standard_normal((b, f, s, c)).astype(np.float32))
    z = jnp.zeros((c,), x.dtype)
    with pltpu.force_tpu_interpret_mode():
        got = T.temporal_attention_fused(
            x, z, z, jnp.zeros((f, c), x.dtype),
            p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"],
            p["to_out"]["kernel"], p["to_out"]["bias"], f, heads,
            ln=False, residual=False)
    want = _einsum_ref(p, x, f, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.parametrize("b,f,s,c,heads", [
    (2, 8, 48, 64, 4),
    (1, 6, 100, 48, 3),
])
def test_fused_ln_chain_matches_reference(b, f, s, c, heads):
    """x + attn(LN(x) + pe) fully fused == the module-level chain."""
    rng = np.random.default_rng(4)
    key = jax.random.PRNGKey(5)
    p = L.mha_init(key, c)
    ln_p = {"scale": jnp.asarray(rng.standard_normal(c), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(c), jnp.float32)}
    pe = jnp.asarray(rng.standard_normal((f, c)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, f, s, c)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = T.temporal_attention_fused(
            x, ln_p["scale"], ln_p["bias"], pe,
            p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"],
            p["to_out"]["kernel"], p["to_out"]["bias"], f, heads,
            ln=True, residual=True)
    normed = L.layer_norm(ln_p, x) + pe[None, :, None, :]
    want = x + _einsum_ref(p, normed, f, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_pick_bs_never_exceeds_s():
    """A block larger than the whole S extent DMAs past the allocation on
    real hardware (allocation-dependent TPU-worker crash — ADVICE round 2).
    _pick_bs must floor to the lane-alignment step and return 0 (einsum
    fallback) when even the minimum aligned block exceeds S."""
    # f=6 -> step 64: s=40 cannot host an aligned block
    assert T._pick_bs(40, 48, 6, 4) == 0
    for s, f in [(100, 6), (40, 8), (6272, 24), (98, 24), (8, 16)]:
        bs = T._pick_bs(s, 48, f, 4)
        assert bs <= s, (s, f, bs)


def test_dispatch_none_on_cpu():
    p = L.mha_init(jax.random.PRNGKey(0), 64)
    x = jnp.zeros((1, 4, 16, 64))
    assert T.temporal_attention(p, x, 4, 4) is None


def test_motion_module_unchanged_on_cpu():
    """motion_module_apply falls back to the einsum path off-TPU — same
    output as before the kernel existed (covered in depth by
    tests/test_motion_module.py; this is the dispatch-level check)."""
    from mimo_tpu.config import MotionModuleConfig
    key = jax.random.PRNGKey(2)
    mcfg = MotionModuleConfig(num_heads=4, num_transformer_blocks=1,
                              attentions_per_block=2, norm_num_groups=8)
    p = U.motion_module_init(key, 32, mcfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 4, 6, 32))
    y = U.motion_module_apply(p, x, 4, mcfg)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
