"""SAM2 video predictor + HMR head tests on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import sam2 as S2
from mimo_tpu.decomp import hmr as HM


def test_sam2_video_predictor_end_to_end():
    cfg = S2.tiny_sam2_config()
    p = S2.sam2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frames = [rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
              for _ in range(4)]
    pred = S2.SAM2VideoPredictor(p, cfg)
    pred.init_state(frames)
    m0 = pred.add_new_points(0, np.array([[32.0, 24.0]]), np.array([1]))
    assert m0.shape == (48, 64) and m0.dtype == bool
    masks = pred.propagate_in_video()
    assert masks.shape == (4, 48, 64)
    assert masks.dtype == bool


def test_sam2_video_predictor_bf16_params():
    """The chip runs bf16 params while pos encodings / scan carries are
    f32 — propagate must not feed mixed-dtype q/k/v into the attention
    dispatch (ledger v3 track failure: 'query dtype should be float32,
    but got bfloat16' in _rope_attention's memory cross-attention)."""
    cfg = S2.tiny_sam2_config()
    p = S2.sam2_init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, p)
    rng = np.random.default_rng(0)
    frames = [rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
              for _ in range(4)]
    pred = S2.SAM2VideoPredictor(p, cfg)
    pred.init_state(frames)
    m0 = pred.add_new_points(0, np.array([[32.0, 24.0]]), np.array([1]))
    assert m0.shape == (48, 64) and m0.dtype == bool
    masks = pred.propagate_in_video()
    assert masks.shape == (4, 48, 64) and masks.dtype == bool


def test_sam2_track_object_merges():
    cfg = S2.tiny_sam2_config()
    p = S2.sam2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    frames = [rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
              for _ in range(3)]
    merged = S2.track_object(p, cfg, frames, np.array([[16.0, 16.0]]),
                             np.array([1]))
    assert merged.shape == (3, 32, 32)


def test_hmr_forward_shapes():
    cfg = HM.tiny_hmr_config(num_joints=5)
    p = HM.hmr_init(jax.random.PRNGKey(0), cfg)
    crops = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    out = HM.hmr_forward(p, cfg, crops)
    assert out["pose_rotmats"].shape == (3, 5, 3, 3)
    assert out["betas"].shape == (3, 4)
    assert out["cam"].shape == (3, 3)
    R = np.asarray(out["pose_rotmats"])
    for b in range(3):
        for j in range(5):
            np.testing.assert_allclose(R[b, j] @ R[b, j].T, np.eye(3),
                                       atol=1e-4)


def test_hmr_mean_init_identity_rotation():
    """Zero IEF deltas (zero-init decoders would) keep pose near identity;
    with random weights just check rotmats are valid and pose differs from
    mean (IEF actually updates)."""
    cfg = HM.tiny_hmr_config()
    p = HM.hmr_init(jax.random.PRNGKey(2), cfg)
    crops = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
    out = HM.hmr_forward(p, cfg, crops)
    assert np.isfinite(np.asarray(out["pose_rotmats"])).all()


def test_square_crop_and_cam_lift():
    img = (np.random.default_rng(0).uniform(0, 255, (100, 80, 3))
           .astype(np.uint8))
    crop, cs = HM.square_crop(img, np.array([20, 30, 60, 90]),
                              out_size=(32, 32))
    assert crop.shape == (32, 32, 3)
    assert cs[0] == 40 and cs[1] == 60 and cs[2] == 60  # cx, cy, size

    cam = np.array([0.9, 0.1, -0.2])
    t = HM.cam_crop_to_full(cam, cs, img_w=80, img_h=100, focal=500.0)
    assert t.shape == (3,)
    assert t[2] > 0  # positive depth


def test_sam2_mid_frame_prompt_traversal():
    """Prompting a middle frame: the forward pass tracks frames after it,
    the backward pass frames before it, and the conditioning frame's
    prompted mask is preserved in both (sam2_video_predictor propagate
    traversal + demo_occ.py:405-504 fwd/bwd merge)."""
    cfg = S2.tiny_sam2_config()
    p = S2.sam2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frames = [rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
              for _ in range(5)]
    pred = S2.SAM2VideoPredictor(p, cfg)
    pred.init_state(frames)
    m0 = pred.add_new_points(2, np.array([[32.0, 24.0]]), np.array([1]))
    fwd = pred.propagate_in_video(reverse=False)
    bwd = pred.propagate_in_video(reverse=True)
    # frames on the untracked side are empty; cond frame mask preserved
    assert fwd[:2].sum() == 0
    assert bwd[3:].sum() == 0
    np.testing.assert_array_equal(fwd[2], m0)
    np.testing.assert_array_equal(bwd[2], m0)
    merged = fwd | bwd
    assert merged.shape == (5, 48, 64)
