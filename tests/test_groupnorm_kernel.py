"""Fused Pallas GroupNorm kernel: numerics vs the XLA path (interpret mode
on CPU). Both variants covered: VMEM-resident (small slabs) and two-phase
tiled (large slabs / full-res VAE shapes). On TPU, layers.group_norm
routes the fp32 path through these kernels."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.models import layers as L
from mimo_tpu.ops import groupnorm as G


def _xla_ref(x, scale, bias, groups, fuse_silu):
    ref = L.group_norm({"scale": scale, "bias": bias}, x, groups, 1e-5)
    return jax.nn.silu(ref) if fuse_silu else ref


@pytest.mark.parametrize("shape,groups", [
    ((2, 35, 41, 320), 32),
    ((3, 8, 8, 64), 8),
    ((1, 130, 7, 256), 32),   # rows not a multiple of the tile
])
@pytest.mark.parametrize("fuse_silu", [False, True])
def test_resident_kernel_matches_xla(shape, groups, fuse_silu):
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
    ref = _xla_ref(x, scale, bias, groups, fuse_silu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("shape,groups", [
    ((2, 35, 41, 320), 32),   # rows not a multiple of the row block
    ((2, 16, 16, 64), 8),     # single row block (nblk == 1)
    ((1, 130, 7, 256), 32),
])
@pytest.mark.parametrize("fuse_silu", [False, True])
def test_two_phase_kernel_matches_xla(shape, groups, fuse_silu):
    rng = np.random.default_rng(1)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    n = shape[0]
    s = x.size // (n * c)
    with pltpu.force_tpu_interpret_mode():
        y = G._gn_pallas(x.reshape(n, s, c), scale, bias, groups, 1e-5,
                         fuse_silu, force_two_phase=True).reshape(shape)
    ref = _xla_ref(x, scale, bias, groups, fuse_silu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_two_phase_small_block(monkeypatch):
    """Force multiple row blocks (the production regime for lvl0/VAE
    shapes) by shrinking the VMEM budget."""
    monkeypatch.setattr(G, "_VMEM_BUDGET", 512 * 1024)
    rng = np.random.default_rng(2)
    shape, groups = (2, 49, 41, 320), 32   # s=2009, block_s 64 -> 32 blocks
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    n = shape[0]
    s = x.size // (n * c)
    with pltpu.force_tpu_interpret_mode():
        y = G._gn_pallas(x.reshape(n, s, c), scale, bias, groups, 1e-5,
                         True, force_two_phase=True).reshape(shape)
    ref = _xla_ref(x, scale, bias, groups, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("two_phase", [False, True])
def test_row_add_fused(two_phase):
    """GN(x + row_add[:, None]) fused in-kernel (the resnet temb add)."""
    rng = np.random.default_rng(3)
    shape, groups = (3, 9, 5, 64), 8
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    radd = jnp.asarray(rng.standard_normal((3, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    n = shape[0]
    s = x.size // (n * c)
    with pltpu.force_tpu_interpret_mode():
        y = G._gn_pallas(x.reshape(n, s, c), scale, bias, groups, 1e-5,
                         True, force_two_phase=two_phase,
                         row_add=radd).reshape(shape)
    ref = _xla_ref(x + radd[:, None, None, :], scale, bias, groups, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("shape,groups,radd,small_block", [
    ((2, 35, 41, 320), 32, False, False),
    ((3, 9, 5, 64), 8, True, False),      # fused temb add
    ((2, 49, 41, 320), 32, True, True),   # multiple S blocks
    ((1, 130, 7, 256), 32, False, False), # ragged S vs block
])
@pytest.mark.parametrize("fuse_silu", [False, True])
def test_snc_kernel_matches_xla(shape, groups, radd, small_block,
                                fuse_silu, monkeypatch):
    """Transposed-layout (S, N, C) kernel == XLA GN of the (N, S, C)
    logical view (the conv-adjacent UNet sites)."""
    if small_block:
        monkeypatch.setattr(G, "_VMEM_BUDGET", 512 * 1024)
    rng = np.random.default_rng(4)
    c = shape[-1]
    n = shape[0]
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    row_add = (jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
               if radd else None)
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    s = x.size // (n * c)
    x_t = jnp.transpose(x.reshape(n, s, c), (1, 0, 2))
    with pltpu.force_tpu_interpret_mode():
        y_t = G._gn_pallas_snc(x_t, scale, bias, groups, 1e-5, fuse_silu,
                               row_add=row_add)
    y = jnp.transpose(y_t, (1, 0, 2)).reshape(shape)
    x_in = x if row_add is None else x + row_add[:, None, None, :]
    ref = _xla_ref(x_in, scale, bias, groups, fuse_silu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_fallback_on_cpu():
    x = jnp.zeros((2, 4, 4, 64))
    out = G.group_norm_fused(x, jnp.ones(64), jnp.zeros(64), 8, 1e-5)
    assert out is None  # not on TPU -> caller falls back to XLA
