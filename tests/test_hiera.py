"""Hiera backbone: stage shapes, pooling, window/global blocks, neck."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import hiera as HI


def test_block_plan_dims_and_pooling():
    cfg = HI.HieraConfig(embed_dim=16, num_heads=2, stages=(2, 2, 2, 2),
                         window_spec=(2, 2, 2, 2), global_blocks=(7,),
                         input_size=(64, 64))
    plan = cfg.block_plan()
    assert len(plan) == 8
    dims = [p[1] for p in plan]
    assert dims == [16, 16, 32, 32, 64, 64, 128, 128]
    pools = [p[4] for p in plan]
    assert pools == [False, False, True, False, True, False, True, False]
    assert plan[7][3] == 0  # global block has window 0


def test_hiera_stage_shapes():
    cfg = HI.tiny_hiera_config()
    p = HI.hiera_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    feats = HI.hiera_apply(p, cfg, x)
    assert len(feats) == 4
    assert feats[0].shape == (2, 16, 16, 16)    # stride 4
    assert feats[1].shape == (2, 8, 8, 32)      # stride 8
    assert feats[2].shape == (2, 4, 4, 64)      # stride 16
    assert feats[3].shape == (2, 2, 2, 128)     # stride 32
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()


def test_hiera_neck():
    cfg = HI.tiny_hiera_config()
    p = HI.hiera_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    f16 = HI.encode_image_hiera(p, cfg, x)
    assert f16.shape == (1, 4, 4, cfg.neck_dim)


def test_hiera_large_plan():
    cfg = HI.HieraConfig()  # hiera-L defaults
    plan = cfg.block_plan()
    assert len(plan) == 48
    assert plan[0][1] == 144
    assert plan[-1][1] == 144 * 8
    # global attention blocks sit in stage 3 (window 0)
    for g in cfg.global_blocks:
        assert plan[g][3] == 0
