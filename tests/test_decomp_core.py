"""Decomposition core math: rotation transforms, SMPL LBS, rasterizer."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import transforms as T
from mimo_tpu.decomp import smpl as S
from mimo_tpu.decomp import renderer as R


def test_aa_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    aa = rng.standard_normal((32, 3)).astype(np.float32)
    aa *= (rng.uniform(0.01, np.pi - 0.1, (32, 1)).astype(np.float32)
           / np.linalg.norm(aa, axis=-1, keepdims=True))
    Rm = T.aa_to_rotmat(jnp.asarray(aa))
    back = np.asarray(T.rotmat_to_aa(Rm))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_rotmat_orthonormal():
    rng = np.random.default_rng(1)
    aa = rng.standard_normal((16, 3)).astype(np.float32)
    Rm = np.asarray(T.aa_to_rotmat(jnp.asarray(aa)))
    eye = np.eye(3)
    for m in Rm:
        np.testing.assert_allclose(m @ m.T, eye, atol=1e-5)
        assert np.linalg.det(m) > 0.99


def test_aa_zero_is_identity():
    Rm = np.asarray(T.aa_to_rotmat(jnp.zeros((2, 3))))
    np.testing.assert_allclose(Rm, np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-7)


def test_rot6d():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 6)).astype(np.float32)
    Rm = np.asarray(T.rot6d_to_rotmat(jnp.asarray(x)))
    for m in Rm:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(m) > 0.99


def test_matrix_aa_matches_torch_roundtrip():
    """Cross-check against torch's matrix_exp-free path via scipy."""
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(3)
    aa = rng.standard_normal((16, 3)).astype(np.float32)
    Rm = np.asarray(T.aa_to_rotmat(jnp.asarray(aa)))
    want = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(Rm, want, atol=1e-5)


# ---------------------------------------------------------------------------
# SMPL
# ---------------------------------------------------------------------------


def test_lbs_rest_pose_identity():
    """Zero pose, zero betas: vertices == template."""
    m = S.random_test_model(jax.random.PRNGKey(0))
    B = 2
    verts, joints = S.lbs(m, jnp.zeros((B, 4)),
                          jnp.zeros((B, m.num_joints, 3)))
    np.testing.assert_allclose(np.asarray(verts),
                               np.broadcast_to(np.asarray(m.v_template),
                                               (B,) + m.v_template.shape),
                               atol=1e-5)


def test_lbs_global_rotation():
    """Pure global orient rotates everything about the root joint."""
    m = S.random_test_model(jax.random.PRNGKey(0))
    aa = jnp.zeros((1, m.num_joints, 3)).at[0, 0].set(
        jnp.asarray([0.0, 0.0, np.pi / 2]))
    verts, joints = S.lbs(m, jnp.zeros((1, 4)), aa)
    root = np.asarray(jnp.einsum("jv,vc->jc", m.J_regressor,
                                 m.v_template))[0]
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    want = (np.asarray(m.v_template) - root) @ Rz.T + root
    np.testing.assert_allclose(np.asarray(verts[0]), want, atol=1e-4)


def test_lbs_translation():
    m = S.random_test_model(jax.random.PRNGKey(0))
    t = jnp.asarray([[1.0, 2.0, 3.0]])
    v0, j0 = S.lbs(m, jnp.zeros((1, 4)), jnp.zeros((1, m.num_joints, 3)))
    v1, j1 = S.lbs(m, jnp.zeros((1, 4)), jnp.zeros((1, m.num_joints, 3)),
                   transl=t)
    np.testing.assert_allclose(np.asarray(v1 - v0),
                               np.broadcast_to([[1, 2, 3]], v0.shape),
                               atol=1e-5)


def test_chumpy_shim_unpickles(tmp_path):
    import pickle
    import scipy.sparse as sp
    data = {
        "v_template": np.random.randn(8, 3).astype(np.float64),
        "shapedirs": np.random.randn(8, 3, 4),
        "posedirs": np.random.randn(8, 3, 9),
        "J_regressor": sp.csc_matrix(np.abs(np.random.randn(2, 8))),
        "weights": np.abs(np.random.randn(8, 2)),
        "kintree_table": np.array([[4294967295, 0], [0, 1]], np.uint32),
        "f": np.zeros((3, 3), np.uint32),
    }
    p = tmp_path / "model.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    m = S.load_smpl_pickle(str(p))
    assert m.num_joints == 2
    assert m.num_verts == 8
    assert m.parents[0] == -1


# ---------------------------------------------------------------------------
# rasterizer
# ---------------------------------------------------------------------------


def test_rasterize_single_triangle():
    verts = jnp.asarray([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0],
                         [0.0, 0.5, 2.0]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.ones((3, 3))
    rgb, alpha, depth = R.rasterize(
        verts, faces, colors, jnp.asarray(32.0), jnp.asarray([16.0, 16.0]),
        height=32, width=32, face_chunk=4)
    a = np.asarray(alpha)
    assert a.sum() > 10          # some pixels covered
    assert a[16, 16] == 1.0      # center covered
    assert a[0, 0] == 0.0        # corner not
    d = np.asarray(depth)
    np.testing.assert_allclose(d[a > 0].min(), 2.0, atol=1e-3)


def test_rasterize_depth_order():
    """Nearer triangle must win the z-buffer."""
    verts = jnp.asarray([
        [-1.0, -1.0, 4.0], [1.0, -1.0, 4.0], [0.0, 1.0, 4.0],   # far, red
        [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0], [0.0, 1.0, 2.0],   # near, green
    ])
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    colors = jnp.asarray([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, jnp.float32)
    rgb, alpha, depth = R.rasterize(
        verts, faces, colors, jnp.asarray(16.0), jnp.asarray([16.0, 16.0]),
        height=32, width=32, face_chunk=1)
    c = np.asarray(rgb)[16, 16]
    np.testing.assert_allclose(c, [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth)[16, 16], 2.0, atol=1e-2)


def test_render_frames_vmap():
    verts = jnp.asarray([[[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0],
                          [0.0, 0.5, 2.0]]] * 3)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.ones((3, 3))
    rgb, alpha, depth = R.render_frames(
        verts, faces, colors, jnp.asarray(16.0), jnp.asarray([8.0, 8.0]),
        height=16, width=16, face_chunk=1)
    assert rgb.shape == (3, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(rgb[0]), np.asarray(rgb[2]))


def test_rasterize_banded_matches_full():
    """Row-band rasterizer == full-height kernel on a random mesh (z-buffer
    is order-independent for distinct depths), and a band-violating mesh
    reports bad=True so render_frames falls back to the exact kernel."""
    rng = np.random.default_rng(7)
    V, F = 60, 40
    verts = np.stack([rng.uniform(-1, 1, V), rng.uniform(-1, 1, V),
                      rng.uniform(1.5, 4.0, V)], axis=1).astype(np.float32)
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (V, 3)).astype(np.float32)
    focal = jnp.asarray(20.0)
    center = jnp.asarray([24.0, 24.0])

    rgb0, a0, d0 = R.rasterize(jnp.asarray(verts), jnp.asarray(faces),
                               jnp.asarray(colors), focal, center,
                               height=48, width=48, face_chunk=8)
    rgb1, a1, d1, bad = R.rasterize_banded(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(colors),
        focal, center, height=48, width=48, face_chunk=8, band=48)
    # band == height: geometry can never violate, results exact
    assert not bool(bad)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), atol=1e-5)

    # small band: tall faces must raise the violation flag
    _, _, _, bad8 = R.rasterize_banded(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(colors),
        focal, center, height=48, width=48, face_chunk=8, band=8)
    assert bool(bad8)

    # render_frames with the small band must still be exact via fallback
    rgbf, af, df = R.render_frames(
        jnp.asarray(verts)[None], jnp.asarray(faces), jnp.asarray(colors),
        focal, center, height=48, width=48, face_chunk=8, band=8,
        band_chunk=8)
    np.testing.assert_allclose(np.asarray(af[0]), np.asarray(a0))
    np.testing.assert_allclose(np.asarray(df[0]), np.asarray(d0), atol=1e-5)


def test_rasterize_banded_small_faces_exact():
    """Mesh of short faces (fits the band): banded result == full kernel
    without any fallback."""
    rng = np.random.default_rng(11)
    # grid of tiny triangles across the image
    vs, fs = [], []
    for gy in range(6):
        for gx in range(6):
            x = -0.9 + gx * 0.3
            y = -0.9 + gy * 0.3
            i = len(vs)
            z = float(rng.uniform(2.0, 3.0))
            vs += [[x, y, z], [x + 0.1, y, z], [x, y + 0.1, z]]
            fs.append([i, i + 1, i + 2])
    verts = jnp.asarray(vs, jnp.float32)
    faces = jnp.asarray(fs, jnp.int32)
    colors = jnp.asarray(rng.uniform(0, 1, (len(vs), 3)), jnp.float32)
    focal = jnp.asarray(20.0)
    center = jnp.asarray([24.0, 24.0])

    rgb0, a0, d0 = R.rasterize(verts, faces, colors, focal, center,
                               height=48, width=48, face_chunk=4)
    rgb1, a1, d1, bad = R.rasterize_banded(
        verts, faces, colors, focal, center, height=48, width=48,
        face_chunk=4, band=16)
    assert not bool(bad)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), atol=1e-5)
