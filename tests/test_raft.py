"""RAFT flow tests on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import raft as R
from mimo_tpu.ops.sampling import bilinear_sample, flow_warp, deform_conv2d


def test_bilinear_sample_exact_grid():
    img = jnp.arange(12.0).reshape(3, 4, 1)
    pts = jnp.asarray([[0.0, 0.0], [3.0, 2.0], [1.0, 1.0]])
    out = np.asarray(bilinear_sample(img, pts))[:, 0]
    np.testing.assert_allclose(out, [0.0, 11.0, 5.0])


def test_bilinear_sample_midpoint():
    img = jnp.asarray([[0.0, 2.0], [4.0, 6.0]])[..., None]
    out = float(bilinear_sample(img, jnp.asarray([0.5, 0.5]))[0])
    assert abs(out - 3.0) < 1e-6


def test_flow_warp_identity_and_shift():
    img = jnp.arange(2 * 4 * 5 * 1.0).reshape(2, 4, 5, 1)
    zero = jnp.zeros((2, 4, 5, 2))
    np.testing.assert_allclose(np.asarray(flow_warp(img, zero)),
                               np.asarray(img), atol=1e-5)
    # flow of +1 in x samples the pixel to the right
    shift = zero.at[..., 0].set(1.0)
    w = np.asarray(flow_warp(img, shift))
    np.testing.assert_allclose(w[:, :, :-1], np.asarray(img)[:, :, 1:],
                               atol=1e-5)


def test_deform_conv_zero_offsets_matches_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 6, 7, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 4)).astype(np.float32))
    off = jnp.zeros((1, 6, 7, 18))
    got = np.asarray(deform_conv2d(x, off, k))
    import torch
    import torch.nn.functional as F
    xt = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    kt = torch.tensor(np.asarray(k)).permute(3, 2, 0, 1)
    want = F.conv2d(xt, kt, padding=1).permute(0, 2, 3, 1).numpy()
    # border taps differ: deform uses zero bilinear outside, conv zero-pads —
    # identical for zero offsets
    np.testing.assert_allclose(got, want, atol=1e-4)


def _np_deform_conv(x, off, k, msk):
    """Reference modulated deform conv (torchvision semantics), pure numpy."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = k.shape
    out = np.zeros((B, H, W, Cout), np.float32)

    def sample(b, yy, xx):
        if yy < 0 or yy > H - 1 or xx < 0 or xx > W - 1:
            pass  # handled by bilinear corners below
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        wy, wx = yy - y0, xx - x0
        acc = np.zeros(Cin, np.float32)
        for dy, wv in ((0, 1 - wy), (1, wy)):
            for dx, wu in ((0, 1 - wx), (1, wx)):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < H and 0 <= xi < W:
                    acc += wv * wu * x[b, yi, xi]
        if yy < -1 or yy > H or xx < -1 or xx > W:
            return np.zeros(Cin, np.float32)
        return acc

    for b in range(B):
        for y in range(H):
            for xx_ in range(W):
                idx = 0
                for i in range(kh):
                    for j in range(kw):
                        dy = off[b, y, xx_, 2 * idx]
                        dx = off[b, y, xx_, 2 * idx + 1]
                        sy = y + (i - (kh - 1) / 2) + dy
                        sx = xx_ + (j - (kw - 1) / 2) + dx
                        v = sample(b, sy, sx) * msk[b, y, xx_, idx]
                        out[b, y, xx_] += v @ k[i, j]
                        idx += 1
    return out


def test_deform_conv_matches_numpy_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 6, 3)).astype(np.float32)
    k = rng.standard_normal((3, 3, 3, 2)).astype(np.float32)
    off = (rng.standard_normal((1, 5, 6, 18)) * 0.7).astype(np.float32)
    msk = 1.0 / (1.0 + np.exp(-rng.standard_normal((1, 5, 6, 9))
                              .astype(np.float32)))
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                   jnp.asarray(k), mask=jnp.asarray(msk)))
    want = _np_deform_conv(x, off, k, msk)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_raft_tiny_shapes():
    cfg = R.tiny_raft_config()
    p = R.raft_init(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 40, 3)) * 2 - 1
    flow = R.raft_flow(p, cfg, img, img)
    assert flow.shape == (2, 32, 40, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_bi_contract():
    cfg = R.tiny_raft_config()
    p = R.raft_init(jax.random.PRNGKey(0), cfg)
    frames = jax.random.uniform(jax.random.PRNGKey(1), (3, 16, 16, 3))
    fwd, bwd = R.raft_bi(p, cfg, frames)
    assert fwd.shape == (2, 16, 16, 2)
    assert bwd.shape == (2, 16, 16, 2)
