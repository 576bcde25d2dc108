"""Fused Pallas GroupNorm kernel: numerics vs the XLA path (interpret mode
on CPU; on-chip perf status tracked in BENCH_NOTES.md — currently parity
with XLA at lvl1/2 shapes, so the model does not route through it yet)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.models import layers as L
from mimo_tpu.ops import groupnorm as G


@pytest.mark.parametrize("shape,groups", [
    ((2, 35, 41, 320), 32),
    ((3, 8, 8, 64), 8),
    ((1, 130, 7, 256), 32),   # rows not a multiple of the tile
])
@pytest.mark.parametrize("fuse_silu", [False, True])
def test_kernel_matches_xla(shape, groups, fuse_silu):
    rng = np.random.default_rng(0)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    n = shape[0]
    s = x.size // (n * c)
    with pltpu.force_tpu_interpret_mode():
        y = G._gn_pallas(x.reshape(n, s, c), scale, bias, groups, 1e-5,
                         fuse_silu).reshape(shape)
    ref = L.group_norm({"scale": scale, "bias": bias}, x, groups, 1e-5)
    if fuse_silu:
        ref = jax.nn.silu(ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_fallback_on_cpu():
    x = jnp.zeros((2, 4, 4, 64))
    out = G.group_norm_fused(x, jnp.ones(64), jnp.zeros(64), 8, 1e-5)
    assert out is None  # not on TPU -> caller falls back to XLA
