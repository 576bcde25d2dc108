"""Motion stage: wrist fusion math + end-to-end sdc rendering with tiny
models."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import hmr as HM
from mimo_tpu.decomp import motion as MO
from mimo_tpu.decomp import smpl as SM
from mimo_tpu.decomp import vitpose as VP
from mimo_tpu.decomp.transforms import aa_to_rotmat


def test_wrist_local_rotation_roundtrip():
    """Composing the chain with the computed local wrist rotation must
    reproduce the hand's global orientation."""
    rng = np.random.default_rng(0)
    J = 8
    body = aa_to_rotmat(jnp.asarray(
        rng.standard_normal((J, 3)).astype(np.float32) * 0.3))
    hand_global = aa_to_rotmat(jnp.asarray(
        rng.standard_normal(3).astype(np.float32)))
    chain = (0, 2, 5)
    local = MO.wrist_local_rotation(body, hand_global, chain)
    G = jnp.eye(3)
    for j in chain:
        G = G @ body[j]
    np.testing.assert_allclose(np.asarray(G @ local),
                               np.asarray(hand_global), atol=1e-5)


def test_mirror_rotmat_is_rotation():
    R = aa_to_rotmat(jnp.asarray([0.3, -0.2, 0.5]))
    M = MO.mirror_rotmat_x(R)
    np.testing.assert_allclose(np.asarray(M @ M.T), np.eye(3), atol=1e-5)
    assert float(jnp.linalg.det(M)) > 0.99


def test_estimate_motion_end_to_end_tiny():
    key = jax.random.PRNGKey(0)
    hmr_cfg = HM.tiny_hmr_config(num_joints=5)
    vp_cfg = VP.tiny_vitpose_config()
    est = MO.MotionEstimator(
        vitpose_params=VP.vitpose_init(jax.random.PRNGKey(1), vp_cfg),
        vitpose_cfg=vp_cfg,
        hmr_params=HM.hmr_init(jax.random.PRNGKey(2), hmr_cfg),
        hmr_cfg=hmr_cfg,
        smpl_model=SM.random_test_model(key),
        focal=100.0,
    )
    rng = np.random.default_rng(0)
    frames = [rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
              for _ in range(2)]
    masks = [np.ones((48, 64), bool)] * 2
    bboxes = np.array([[10, 5, 50, 45], [12, 5, 52, 45]])
    sdc = est.estimate_motion(frames, masks, bboxes)
    assert sdc.shape == (2, 48, 64, 3)
    assert sdc.dtype == np.uint8


def test_fuse_pose_with_hands_52_joints():
    key = jax.random.PRNGKey(0)
    model = SM.random_test_model(key, n_joints=52)
    hmr_cfg = HM.tiny_hmr_config(num_joints=22)
    est = MO.MotionEstimator(
        vitpose_params=None, vitpose_cfg=VP.tiny_vitpose_config(),
        hmr_params=HM.hmr_init(jax.random.PRNGKey(2), hmr_cfg),
        hmr_cfg=hmr_cfg, smpl_model=model)
    rng = np.random.default_rng(1)
    body = np.asarray(aa_to_rotmat(jnp.asarray(
        rng.standard_normal((22, 3)).astype(np.float32) * 0.2)))
    hand = np.asarray(aa_to_rotmat(jnp.asarray(
        rng.standard_normal((16, 3)).astype(np.float32) * 0.2)))
    pose = est.fuse_pose(jnp.asarray(body),
                         {"left": hand, "right": None})
    assert pose.shape == (52, 3)
    # left-hand finger joints set, right-hand ones zero
    assert np.abs(np.asarray(pose[22:37])).sum() > 0
    np.testing.assert_allclose(np.asarray(pose[37:52]), 0.0)


def test_fuse_pose_batch_matches_per_frame():
    """The whole-clip fuse_pose_batch equals per-frame fuse_pose across
    every hand-presence combination (none / left / right / both)."""
    key = jax.random.PRNGKey(0)
    model = SM.random_test_model(key, n_joints=52)
    hmr_cfg = HM.tiny_hmr_config(num_joints=22)
    est = MO.MotionEstimator(
        vitpose_params=None, vitpose_cfg=VP.tiny_vitpose_config(),
        hmr_params=HM.hmr_init(jax.random.PRNGKey(2), hmr_cfg),
        hmr_cfg=hmr_cfg, smpl_model=model)
    rng = np.random.default_rng(7)

    def rmat(n):
        return np.asarray(aa_to_rotmat(jnp.asarray(
            rng.standard_normal((n, 3)).astype(np.float32) * 0.2)))

    T = 4
    body = np.stack([rmat(22) for _ in range(T)])
    hands = [
        {"left": None, "right": None},
        {"left": rmat(16), "right": None},
        {"left": None, "right": rmat(16)},
        {"left": rmat(16), "right": rmat(16)},
    ]
    ref = np.stack([np.asarray(est.fuse_pose(jnp.asarray(body[t]),
                                             hands[t])) for t in range(T)])

    eye = np.broadcast_to(np.eye(3, dtype=body.dtype), (16, 3, 3))
    lrot = np.stack([h["left"] if h["left"] is not None else eye
                     for h in hands])
    rrot = np.stack([h["right"] if h["right"] is not None else eye
                     for h in hands])
    lval = np.asarray([h["left"] is not None for h in hands], np.float32)
    rval = np.asarray([h["right"] is not None for h in hands], np.float32)
    out = np.asarray(est._fuse_batch(
        jnp.asarray(body), jnp.asarray(lrot), jnp.asarray(lval),
        jnp.asarray(rrot), jnp.asarray(rval)))
    np.testing.assert_allclose(out, ref, atol=1e-6)
