"""Motion-module temporal attention: einsum-layout implementation must match
the reference (B*S, F, C)-transpose formulation exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu import config as C
from mimo_tpu.models import layers as L
from mimo_tpu.models import unet as U


def _reference_motion_apply(p, x, frames, mcfg):
    """The transpose-based formulation (torch reference layout)."""
    n, hgt, wid, c = x.shape
    b = n // frames
    residual = x
    h = L.group_norm(p["norm"], x, mcfg.norm_num_groups, 1e-6)
    tokens = h.reshape(n, hgt * wid, c)
    tokens = L.linear(p["proj_in"], tokens)

    t = tokens.reshape(b, frames, hgt * wid, c).transpose(0, 2, 1, 3)
    tokens = t.reshape(b * hgt * wid, frames, c)
    pe = U._temporal_pe(frames, c, tokens.dtype)

    for blk in p["blocks"]:
        for a in blk["attns"]:
            normed = L.layer_norm(a["norm"], tokens) + pe[None]
            q = L.linear(a["attn"]["to_q"], normed)
            k = L.linear(a["attn"]["to_k"], normed)
            v = L.linear(a["attn"]["to_v"], normed)
            o = L.sdpa(q, k, v, mcfg.num_heads)
            tokens = tokens + L.linear(a["attn"]["to_out"], o)
        ff_in = L.layer_norm(blk["ff_norm"], tokens)
        tokens = tokens + L.geglu_ff(blk["ff"], ff_in)

    t = tokens.reshape(b, hgt * wid, frames, c).transpose(0, 2, 1, 3)
    tokens = t.reshape(n, hgt * wid, c)
    tokens = L.linear(p["proj_out"], tokens)
    return tokens.reshape(n, hgt, wid, c) + residual


def test_einsum_layout_matches_transpose_layout():
    mcfg = C.MotionModuleConfig(num_heads=4, norm_num_groups=8)
    p = U.motion_module_init(jax.random.PRNGKey(0), 32, mcfg)
    # give proj_out real weights so the full path is exercised
    p["proj_out"] = L.linear_init(jax.random.PRNGKey(9), 32, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 6, 32))
    got = U.motion_module_apply(p, x, frames=4, mcfg=mcfg)
    want = _reference_motion_apply(p, x, frames=4, mcfg=mcfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
