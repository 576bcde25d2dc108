"""Fused LN+GEGLU-FF Pallas kernel vs the unfused layers path (interpret
mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.models import layers as L
from mimo_tpu.ops import ffn as FFN


def _make(shape, dim, mult, seed):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, shape, jnp.float32)
    ln_p = {"scale": jax.random.normal(k2, (dim,), jnp.float32),
            "bias": jax.random.normal(k3, (dim,), jnp.float32)}
    ff_p = L.geglu_ff_init(k2, dim, mult=mult, dtype=jnp.float32)
    return x, ln_p, ff_p


def _ref(x, ln_p, ff_p):
    return x + L.geglu_ff(ff_p, L.layer_norm(ln_p, x))


@pytest.mark.parametrize("shape,mult", [
    ((3, 40, 64), 2),        # 3-D tokens, rows not a block multiple
    ((2, 5, 24, 128), 2),    # 4-D motion-module tokens
    ((3, 41, 64), 2),        # r=123: NOT an 8-multiple — the row block must
                             # floor to 120 (never ceil past the extent:
                             # ADVICE round 2) and the edge block takes 3
])
def test_ffn_nsc_matches_reference(shape, mult):
    x, ln_p, ff_p = _make(shape, shape[-1], mult, 0)
    with pltpu.force_tpu_interpret_mode():
        r = x.size // shape[-1]
        y = FFN._ffn_pallas_nsc(
            x.reshape(r, shape[-1]), ln_p["scale"], ln_p["bias"],
            ff_p["proj_in"]["kernel"], ff_p["proj_in"]["bias"],
            ff_p["proj_out"]["kernel"], ff_p["proj_out"]["bias"],
            1e-5).reshape(shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x, ln_p, ff_p)),
                               atol=2e-4)


def test_ffn_snc_matches_reference():
    shape, mult = (5, 40, 64), 2
    x, ln_p, ff_p = _make(shape, shape[-1], mult, 1)
    with pltpu.force_tpu_interpret_mode():
        x_t = jnp.transpose(x, (1, 0, 2))
        y_t = FFN._ffn_pallas_snc(
            x_t, ln_p["scale"], ln_p["bias"],
            ff_p["proj_in"]["kernel"], ff_p["proj_in"]["bias"],
            ff_p["proj_out"]["kernel"], ff_p["proj_out"]["bias"], 1e-5)
        y = jnp.transpose(y_t, (1, 0, 2))
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x, ln_p, ff_p)),
                               atol=2e-4)


def test_row_block_never_exceeds_rows():
    """Blocks must floor to the 8-multiple below r — ceiling past the array
    extent is the documented TPU-worker crash mode (ADVICE round 2)."""
    for r in [8, 9, 15, 41, 123, 511, 512, 513, 6272]:
        bm = min(512, FFN._floor8(r))
        assert 8 <= bm <= r


def test_fallback_on_cpu():
    x, ln_p, ff_p = _make((2, 16, 64), 64, 2, 2)
    assert FFN.ffn_ln_geglu_fused(x, ln_p, ff_p) is None


def test_qkv_ln_matches_reference():
    from mimo_tpu.ops import ffn as FFN2
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (3, 40, 64), jnp.float32)
    ln_p = {"scale": jax.random.normal(key, (64,)),
            "bias": jax.random.normal(jax.random.split(key)[0], (64,))}
    attn_p = L.mha_init(key, 64, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        w3 = jnp.concatenate([attn_p["to_q"]["kernel"],
                              attn_p["to_k"]["kernel"],
                              attn_p["to_v"]["kernel"]], axis=1)
        q, k, v = FFN2._qkv_ln_pallas(x.reshape(-1, 64), ln_p["scale"],
                                      ln_p["bias"], w3, 1e-5)
    norm = L.layer_norm(ln_p, x)
    for got, name in ((q, "to_q"), (k, "to_k"), (v, "to_v")):
        want = L.linear(attn_p[name], norm).reshape(-1, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_matmul_bias_residual_matches():
    from mimo_tpu.ops import ffn as FFN3
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (40, 64), jnp.float32)
    res = jax.random.normal(jax.random.split(key)[0], (40, 96), jnp.float32)
    lin = L.linear_init(key, 64, 96, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = FFN3._matmul_res_pallas(x, lin["kernel"], lin["bias"], res)
    want = res + L.linear(lin, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_qkv_ln_snc_matches_reference():
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (3, 40, 64), jnp.float32)
    ln_p = {"scale": jax.random.normal(key, (64,)),
            "bias": jax.random.normal(jax.random.split(key)[0], (64,))}
    attn_p = L.mha_init(key, 64, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        w3 = jnp.concatenate([attn_p["to_q"]["kernel"],
                              attn_p["to_k"]["kernel"],
                              attn_p["to_v"]["kernel"]], axis=1)
        q, k, v = FFN._qkv_ln_pallas_snc(
            jnp.transpose(x, (1, 0, 2)), ln_p["scale"], ln_p["bias"],
            w3, 1e-5)
    # outputs are NATURAL (N, S, inner) — the flash operand layout
    norm = L.layer_norm(ln_p, x)
    for got, name in ((q, "to_q"), (k, "to_k"), (v, "to_v")):
        want = L.linear(attn_p[name], norm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_matmul_snc_matches():
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (3, 40, 64), jnp.float32)   # (N, S, K)
    lin = L.linear_init(key, 64, 96, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got_t = FFN._matmul_pallas_snc(jnp.transpose(x, (1, 0, 2)),
                                       lin["kernel"], lin["bias"])
    want = L.linear(lin, x)
    np.testing.assert_allclose(np.asarray(jnp.transpose(got_t, (1, 0, 2))),
                               np.asarray(want), atol=2e-4)


def test_matmul_res_snc_matches():
    key = jax.random.PRNGKey(17)
    x = jax.random.normal(key, (3, 40, 64), jnp.float32)
    res = jax.random.normal(jax.random.split(key)[0], (3, 40, 96),
                            jnp.float32)
    lin = L.linear_init(key, 64, 96, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        # x NATURAL (N, S, K); res/result (S, N, Cout) transposes
        got_t = FFN._matmul_res_pallas_snc(
            x, lin["kernel"], lin["bias"],
            jnp.transpose(res, (1, 0, 2)))
    want = res + L.linear(lin, x)
    np.testing.assert_allclose(np.asarray(jnp.transpose(got_t, (1, 0, 2))),
                               np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("s", [44, 100])   # s % 8 != 0: ragged edge block
def test_snc_kernels_ragged_s(s):
    """Production 784x784 runs lvl0 at S=9604 (not an 8-multiple): the SNC
    kernels must stay exact when the S axis leaves a ragged edge block
    (outer-axis ragged reads; natural-side bs=8 edge writes end exactly at
    the 8-padded sublane boundary)."""
    key = jax.random.PRNGKey(23)
    x = jax.random.normal(key, (3, s, 64), jnp.float32)
    ln_p = {"scale": jax.random.normal(key, (64,)),
            "bias": jax.random.normal(jax.random.split(key)[0], (64,))}
    attn_p = L.mha_init(key, 64, dtype=jnp.float32)
    lin = L.linear_init(key, 64, 96, dtype=jnp.float32)
    res = jax.random.normal(jax.random.split(key)[1], (3, s, 96),
                            jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        w3 = jnp.concatenate([attn_p["to_q"]["kernel"],
                              attn_p["to_k"]["kernel"],
                              attn_p["to_v"]["kernel"]], axis=1)
        q, k, v = FFN._qkv_ln_pallas_snc(
            jnp.transpose(x, (1, 0, 2)), ln_p["scale"], ln_p["bias"],
            w3, 1e-5)
        got_mr = FFN._matmul_res_pallas_snc(
            jax.random.normal(key, (3, s, 64), jnp.float32),
            lin["kernel"], lin["bias"], jnp.transpose(res, (1, 0, 2)))
    norm = L.layer_norm(ln_p, x)
    for got, name in ((q, "to_q"), (k, "to_k"), (v, "to_v")):
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(L.linear(attn_p[name], norm)),
                                   atol=2e-4)
    want_mr = res + L.linear(
        lin, jax.random.normal(key, (3, s, 64), jnp.float32))
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got_mr, (1, 0, 2))), np.asarray(want_mr),
        atol=2e-4)
