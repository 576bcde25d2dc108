"""Frame-parallel sharding of the decomposition half (parallel/decomp.py).

BASELINE.json config 5: "decomposition → animation, frames data-parallel
sharded across a v5e-8 mesh". These tests run the sharded paths on the
8-device virtual CPU mesh (conftest.py) and assert equivalence with the
single-device paths — the shard_map bodies are per-sample identical
programs, so tolerances are tight.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_tpu.parallel.decomp import frame_parallel, render_frames_sharded
from mimo_tpu.parallel.mesh import get_mesh
from mimo_tpu.decomp import renderer as REND
from mimo_tpu.decomp import vitpose as VP
from mimo_tpu.decomp import hmr as HM


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should give 8 CPU devices"
    return get_mesh(8)


def test_frame_parallel_vitpose_matches_single(mesh):
    cfg = VP.tiny_vitpose_config()
    p = VP.vitpose_init(jax.random.PRNGKey(0), cfg)
    crops = jax.random.normal(jax.random.PRNGKey(1),
                              (8, *cfg.backbone.img_size, 3))
    fn = lambda pp, c: VP.heatmaps_flip_test(pp, cfg, c)
    got = np.asarray(jax.jit(frame_parallel(fn, mesh))(p, crops))
    want = np.asarray(fn(p, crops))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_frame_parallel_pads_ragged_batch(mesh):
    """Batches that don't divide the mesh (5 crops on 8 devices) pad with
    a repeated last sample and slice back — the caller sees exactly its
    own batch."""
    cfg = VP.tiny_vitpose_config()
    p = VP.vitpose_init(jax.random.PRNGKey(0), cfg)
    crops = jax.random.normal(jax.random.PRNGKey(1),
                              (5, *cfg.backbone.img_size, 3))
    fn = lambda pp, c: VP.heatmaps_flip_test(pp, cfg, c)
    got = np.asarray(jax.jit(frame_parallel(fn, mesh))(p, crops))
    want = np.asarray(fn(p, crops))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_frame_parallel_hmr_dict_output(mesh):
    """HMR2's dict-of-arrays output shards per leaf (out_specs pytree
    prefix) and round-trips through the pad/slice wrapper."""
    cfg = HM.tiny_hmr_config()
    p = HM.hmr_init(jax.random.PRNGKey(0), cfg)
    crops = jax.random.normal(jax.random.PRNGKey(1),
                              (6, *cfg.backbone.img_size, 3))
    fn = lambda pp, c: HM.hmr_forward(pp, cfg, c)
    got = jax.jit(frame_parallel(fn, mesh))(p, crops)
    want = fn(p, crops)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k], np.float32),
                                   np.asarray(want[k], np.float32),
                                   atol=2e-5, err_msg=k)


def _toy_scene(T=5, V=12, F=16, H=24, W=20, seed=0):
    rng = np.random.default_rng(seed)
    verts = rng.uniform(-0.5, 0.5, (T, V, 3)).astype(np.float32)
    verts[..., 2] += 3.0
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (V, 3)).astype(np.float32)
    focal = jnp.asarray(30.0)
    center = jnp.asarray([W / 2.0, H / 2.0])
    return (jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(colors),
            focal, center, H, W)


def test_render_frames_sharded_matches_host_loop(mesh):
    verts, faces, colors, focal, center, H, W = _toy_scene()
    got = render_frames_sharded(verts, faces, colors, focal, center,
                                height=H, width=W, mesh=mesh,
                                face_chunk=8, band=8, band_chunk=8)
    want = REND.render_frames(verts, faces, colors, focal, center,
                              height=H, width=W, face_chunk=8, band=8,
                              band_chunk=8)
    for g, w, name in zip(got, want, ("rgb", "alpha", "depth")):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, err_msg=name)


def test_render_frames_sharded_band_fallback(mesh):
    """Scenes that violate the band heuristic (tall faces) must take the
    lax.cond exact-fallback branch and still match the host loop."""
    verts, faces, colors, focal, center, H, W = _toy_scene(seed=3)
    # stretch the scene vertically so faces span more rows than the band
    verts = verts.at[..., 1].multiply(4.0)
    got = render_frames_sharded(verts, faces, colors, focal, center,
                                height=H, width=W, mesh=mesh,
                                face_chunk=8, band=4, band_chunk=8)
    want = REND.render_frames(verts, faces, colors, focal, center,
                              height=H, width=W, face_chunk=8, band=4,
                              band_chunk=8)
    for g, w, name in zip(got, want, ("rgb", "alpha", "depth")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, err_msg=name)


def test_motion_estimator_mesh_matches_single(mesh):
    """Full estimate_motion with the mesh wired through the factory path
    (ViTPose + HMR2 + renderer all frame-parallel) equals the unsharded
    estimator."""
    from mimo_tpu.decomp.motion import MotionEstimator
    from mimo_tpu.decomp import smpl as SM

    hcfg = HM.tiny_hmr_config()
    hp = HM.hmr_init(jax.random.PRNGKey(0), hcfg)
    vcfg = VP.tiny_vitpose_config()
    vp = VP.vitpose_init(jax.random.PRNGKey(1), vcfg)
    smpl = SM.random_test_model(jax.random.PRNGKey(2))

    kw = dict(vitpose_params=vp, vitpose_cfg=vcfg, hmr_params=hp,
              hmr_cfg=hcfg, smpl_model=smpl, focal=50.0)
    est_mesh = MotionEstimator(mesh=mesh, **kw)
    est_one = MotionEstimator(**kw)

    rng = np.random.default_rng(0)
    T, H, W = 3, 32, 24
    frames = [rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
              for _ in range(T)]
    masks = np.zeros((T, H, W), bool)
    masks[:, 4:28, 4:20] = True
    boxes = np.asarray([[4, 4, 20, 28]] * T, np.int64)

    got = est_mesh.estimate_motion(frames, masks, boxes)
    want = est_one.estimate_motion(frames, masks, boxes)
    assert got.shape == want.shape == (T, H, W, 3)
    # uint8 quantization: identical math can still flip a rounding edge
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()
