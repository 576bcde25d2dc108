"""ProPainter-stack tests on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import propainter as PP
from mimo_tpu.decomp import raft as R


def test_flow_completion_preserves_known_regions():
    cfg = PP.tiny_propainter_config()
    p = PP.flow_complete_init(jax.random.PRNGKey(0), cfg)
    flow = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 2))
    mask = jnp.zeros((3, 16, 16, 1)).at[:, 4:8, 4:8].set(1.0)
    out = PP.complete_flow(p, cfg, flow, mask)
    assert out.shape == flow.shape
    # unmasked flow is untouched
    np.testing.assert_allclose(np.asarray(out * (1 - mask)),
                               np.asarray(flow * (1 - mask)), atol=1e-5)


def test_propagate_fills_from_neighbors():
    """A hole in frame 1 with zero flow and clean neighbors gets filled with
    the neighbor's pixels."""
    T, H, W = 3, 8, 8
    frames = jnp.stack([jnp.full((H, W, 3), v) for v in (0.2, 0.5, 0.8)])
    masks = jnp.zeros((T, H, W, 1)).at[1, 2:6, 2:6].set(1.0)
    masked = frames * (1 - masks)
    zero_flow = jnp.zeros((T - 1, H, W, 2))
    filled, rem = PP.propagate_images(masked, masks, zero_flow, zero_flow)
    # hole in frame 1 filled from frame 0 (forward pass first)
    np.testing.assert_allclose(np.asarray(filled[1, 3, 3]), [0.2] * 3,
                               atol=1e-5)
    assert float(rem.sum()) == 0.0


def test_generator_shapes_and_composite():
    cfg = PP.tiny_propainter_config()
    p = PP.generator_init(jax.random.PRNGKey(0), cfg)
    T, H, W = 4, 24, 24
    frames = jax.random.uniform(jax.random.PRNGKey(1), (T, H, W, 3)) * 2 - 1
    masks = jnp.zeros((T, H, W, 1)).at[:, 8:16, 8:16].set(1.0)
    out = PP.inpaint_generate(p, cfg, frames, masks, frames, masks)
    assert out.shape == (T, H, W, 3)
    # outside holes the propagated frames pass through exactly
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]),
                               np.asarray(frames[:, 0, 0]), atol=1e-5)


def test_inpaint_video_end_to_end_tiny():
    cfg = PP.tiny_propainter_config()
    rcfg = R.tiny_raft_config()
    params = PP.propainter_init(jax.random.PRNGKey(0), cfg)
    rparams = R.raft_init(jax.random.PRNGKey(1), rcfg)
    T, H, W = 3, 16, 16
    frames = jax.random.uniform(jax.random.PRNGKey(2), (T, H, W, 3))
    masks = jnp.zeros((T, H, W, 1)).at[:, 4:8, 4:8].set(1.0)
    out = PP.inpaint_video(params, cfg, rparams, rcfg, frames, masks)
    assert out.shape == (T, H, W, 3)
    v = np.asarray(out)
    assert np.isfinite(v).all()
    assert v.min() >= 0 and v.max() <= 1
