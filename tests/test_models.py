"""Shape/structure tests for the model zoo on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu import config as C
from mimo_tpu.models import unet as U
from mimo_tpu.models import vae as V
from mimo_tpu.models import clip_vision as CV
from mimo_tpu.models import pose_guider as PG


def test_unet2d_banks():
    cfg = C.tiny_unet_config(4, False)
    p = U.unet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 32, 32, 4))
    ctx = jnp.zeros((2, 1, cfg.cross_attention_dim))
    banks = U.unet2d_apply(p, cfg, x, jnp.zeros(()), ctx)
    assert len(banks) == U.num_banks(cfg)
    # tiny cfg: layers=1, 3 cross-attn down blocks + mid + 3 up blocks × 2
    assert len(banks) == 3 * 1 + 1 + 3 * 2
    for b in banks:
        assert b.shape[0] == 2
        assert b.ndim == 3


def test_unet3d_forward_with_banks_and_cfg():
    cfg2 = C.tiny_unet_config(4, False)
    cfg3 = C.tiny_unet_config(8, True)
    key = jax.random.PRNGKey(0)
    p2 = U.unet_init(key, cfg2)
    p3 = U.unet_init(jax.random.PRNGKey(1), cfg3)

    ref_lat = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
    ctx2 = jax.random.normal(jax.random.PRNGKey(3),
                             (2, 1, cfg2.cross_attention_dim))
    banks = U.unet2d_apply(p2, cfg2, ref_lat, jnp.zeros(()), ctx2)
    cond_banks = [b[1] for b in banks]  # cond-written entries

    W, f = 2, 4
    x = jax.random.normal(jax.random.PRNGKey(4), (2 * W, f, 16, 16, 8))
    ctx = jnp.concatenate([jnp.zeros((W, 1, cfg3.cross_attention_dim)),
                           jnp.ones((W, 1, cfg3.cross_attention_dim))])
    pose = jax.random.normal(jax.random.PRNGKey(5),
                             (2 * W, f, 16, 16, cfg3.block_out_channels[0]))
    out = U.unet3d_apply(p3, cfg3, x, jnp.asarray(500.0), ctx, pose,
                         cond_banks, cfg_split=True)
    assert out.shape == (2 * W, f, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet3d_uncond_half_ignores_banks():
    """The uncond half must be invariant to bank contents (plain self-attn,
    reference mutual_self_attention.py:177-197)."""
    cfg3 = C.tiny_unet_config(8, True)
    p3 = U.unet_init(jax.random.PRNGKey(1), cfg3)
    W, f = 1, 2
    x = jax.random.normal(jax.random.PRNGKey(4), (2 * W, f, 16, 16, 8))
    ctx = jnp.zeros((2 * W, 1, cfg3.cross_attention_dim))
    nb = U.num_banks(cfg3)
    # bank token counts per block mirror its spatial resolution
    shapes = []
    cfg2 = C.tiny_unet_config(4, False)
    p2 = U.unet_init(jax.random.PRNGKey(0), cfg2)
    banks = U.unet2d_apply(p2, cfg2, jnp.zeros((1, 16, 16, 4)),
                           jnp.zeros(()), jnp.zeros((1, 1, 48)))
    banks_a = [b[0] for b in banks]
    banks_b = [b[0] + 100.0 for b in banks]
    out_a = U.unet3d_apply(p3, cfg3, x, jnp.asarray(1.0), ctx, None,
                           banks_a, cfg_split=True)
    out_b = U.unet3d_apply(p3, cfg3, x, jnp.asarray(1.0), ctx, None,
                           banks_b, cfg_split=True)
    half = np.asarray(out_a[:W]), np.asarray(out_b[:W])
    np.testing.assert_allclose(half[0], half[1], atol=1e-5)
    # the cond half must NOT be invariant
    assert np.abs(np.asarray(out_a[W:]) - np.asarray(out_b[W:])).max() > 1e-4


def test_motion_module_zero_init_is_identity():
    """Zero-init proj_out makes the motion module the identity at init
    (reference motion_module.py:72-74)."""
    mcfg = C.MotionModuleConfig(num_heads=4, norm_num_groups=8)
    p = U.motion_module_init(jax.random.PRNGKey(0), 32, mcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 32))
    y = U.motion_module_apply(p, x, frames=4, mcfg=mcfg)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_vae_roundtrip_shapes():
    cfg = C.tiny_vae_config()
    p = V.vae_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    z = V.encode_mean(p, cfg, x)
    ds = cfg.downscale
    assert z.shape == (3, 32 // ds, 32 // ds, 4)
    y = V.decode(p, cfg, z)
    assert y.shape == (3, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_vae_downsample_matches_torch_asymmetric_pad():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 9, 9, 4)).astype(np.float32)
    k = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)
    h = jnp.pad(jnp.asarray(x), ((0, 0), (0, 1), (0, 1), (0, 0)))
    got = jax.lax.conv_general_dilated(
        h, jnp.asarray(k), (2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    xt = F.pad(xt, (0, 1, 0, 1))
    want = F.conv2d(xt, torch.tensor(k).permute(3, 2, 0, 1), stride=2)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_clip_vision_shapes():
    cfg = C.tiny_clip_config()
    p = CV.clip_vision_init(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1),
                             (2, cfg.image_size, cfg.image_size, 3))
    emb = CV.clip_image_embed(p, cfg, CV.clip_preprocess(img))
    assert emb.shape == (2, cfg.projection_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_pose_guider_zero_out_at_init():
    cfg = C.PoseGuiderConfig(block_out_channels=(8, 8, 16, 16),
                             embedding_channels=32)
    p = PG.pose_guider_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3))
    y = PG.pose_guider_apply(p, x)
    assert y.shape == (1, 2, 4, 4, 32)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-7)
