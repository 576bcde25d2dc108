"""SMPL / SMPL-H body model: linear blend skinning, pure jnp.

Replaces the reference's smplx dependency (SMPL-H neutral driven at
video_decomp/run.py:340-348,781-785) and the vendored chumpy package (6.3k
LoC kept solely so legacy SMPL pickles unpickle — here a 40-line unpickler
shim does that job).

Standard SMPL math (Loper et al. 2015; SMPL-H adds 2×15 hand joints):
  v_shaped = v_template + shapedirs @ betas
  joints   = J_regressor @ v_shaped
  v_posed  = v_shaped + posedirs @ vec(R[1:] - I)
  world transforms accumulate down the kinematic tree; skinning is
  W · A applied to homogeneous vertices.
"""

from __future__ import annotations

import io
import pickle
from dataclasses import dataclass
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp.transforms import aa_to_rotmat


@dataclass(frozen=True)
class SMPLModel:
    """Model constants (from the published SMPL/SMPL-H artifacts)."""

    v_template: jnp.ndarray   # (V, 3)
    shapedirs: jnp.ndarray    # (V, 3, n_betas)
    posedirs: jnp.ndarray     # (P, V*3), P = 9*(J-1)
    J_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    parents: np.ndarray       # (J,) int, parents[0] == -1
    faces: np.ndarray         # (F, 3) int

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def lbs(model: SMPLModel, betas: jnp.ndarray, pose_aa: jnp.ndarray,
        transl: Optional[jnp.ndarray] = None):
    """Forward the body model.

    betas: (B, n_betas); pose_aa: (B, J, 3) axis-angle incl. global orient
    at index 0; transl: (B, 3) optional. Returns (verts (B, V, 3),
    joints (B, J, 3)).
    """
    B = betas.shape[0]
    J = model.num_joints

    # shape blendshapes
    v_shaped = model.v_template[None] + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, betas)
    joints = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped)

    # pose blendshapes
    R = aa_to_rotmat(pose_aa)                              # (B, J, 3, 3)
    eye = jnp.eye(3, dtype=R.dtype)
    pose_feature = (R[:, 1:] - eye).reshape(B, -1)         # (B, 9(J-1))
    v_posed = v_shaped + jnp.einsum(
        "pn,bp->bn", model.posedirs, pose_feature).reshape(B, -1, 3)

    # kinematic chain: accumulate world transforms
    parents = model.parents
    rel_j = joints - jnp.where(
        (parents >= 0)[None, :, None],
        joints[:, np.maximum(parents, 0)], 0.0)

    def make_tf(Rj, tj):
        tf = jnp.zeros(Rj.shape[:-2] + (4, 4), Rj.dtype)
        tf = tf.at[..., :3, :3].set(Rj)
        tf = tf.at[..., :3, 3].set(tj)
        tf = tf.at[..., 3, 3].set(1.0)
        return tf

    local = make_tf(R, rel_j)                              # (B, J, 4, 4)
    world = [local[:, 0]]
    for j in range(1, J):
        world.append(world[parents[j]] @ local[:, j])
    A = jnp.stack(world, axis=1)                           # (B, J, 4, 4)
    posed_joints = A[..., :3, 3]

    # remove the rest-pose joint locations from the transforms
    joints_h = jnp.concatenate(
        [joints, jnp.zeros((B, J, 1), joints.dtype)], axis=-1)
    corr = jnp.einsum("bjxy,bjy->bjx", A, joints_h)
    A = A.at[..., :3, 3].add(-corr[..., :3])

    # skinning
    T = jnp.einsum("vj,bjxy->bvxy", model.lbs_weights, A)  # (B, V, 4, 4)
    v_h = jnp.concatenate(
        [v_posed, jnp.ones((B, v_posed.shape[1], 1), v_posed.dtype)], axis=-1)
    verts = jnp.einsum("bvxy,bvy->bvx", T, v_h)[..., :3]

    if transl is not None:
        verts = verts + transl[:, None]
        posed_joints = posed_joints + transl[:, None]
    return verts, posed_joints


# ---------------------------------------------------------------------------
# artifact loading (replaces chumpy)
# ---------------------------------------------------------------------------


class _ChumpyShim:
    """Stands in for chumpy.Ch during unpickling; keeps only the array."""

    def __init__(self, *args, **kwargs):
        self._data = None

    def __setstate__(self, state):
        if isinstance(state, dict):
            for key in ("x", "_data", "a"):
                if key in state:
                    self._data = np.asarray(state[key])
                    break

    def __array__(self, dtype=None):
        return np.asarray(self._data, dtype=dtype)


class _SMPLUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyShim
        if module == "scipy.sparse.csc" or module.startswith("scipy.sparse"):
            import scipy.sparse
            return getattr(scipy.sparse, name, scipy.sparse.csc_matrix)
        return super().find_class(module, name)


def _dense(x) -> np.ndarray:
    if hasattr(x, "todense"):
        return np.asarray(x.todense())
    return np.asarray(x)


def load_smpl_pickle(path: str, dtype=jnp.float32) -> SMPLModel:
    """Load a published SMPL/SMPL-H .pkl (legacy chumpy pickles included)."""
    with open(path, "rb") as f:
        data = _SMPLUnpickler(f, encoding="latin1").load()
    return from_arrays(data, dtype)


def load_smpl_npz(path: str, dtype=jnp.float32) -> SMPLModel:
    with np.load(path, allow_pickle=True) as f:
        return from_arrays({k: f[k] for k in f.files}, dtype)


def from_arrays(data: Dict[str, Any], dtype=jnp.float32) -> SMPLModel:
    shapedirs = _dense(data["shapedirs"])
    posedirs = _dense(data["posedirs"])
    if posedirs.ndim == 3:  # (V, 3, P) -> (P, V*3)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    parents = np.asarray(_dense(data["kintree_table"]))[0].astype(np.int64)
    parents[0] = -1
    return SMPLModel(
        v_template=jnp.asarray(_dense(data["v_template"]), dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        J_regressor=jnp.asarray(_dense(data["J_regressor"]), dtype),
        lbs_weights=jnp.asarray(_dense(data["weights"]), dtype),
        parents=parents,
        faces=np.asarray(_dense(data["f"]), np.int64),
    )


def random_test_model(key, n_verts: int = 64, n_joints: int = 5,
                      n_betas: int = 4) -> SMPLModel:
    """Small synthetic model for tests (no SMPL artifacts in this repo)."""
    ks = jax.random.split(key, 6)
    v_template = jax.random.normal(ks[0], (n_verts, 3)) * 0.3
    parents = np.array([-1] + [max(0, j - 1) for j in range(1, n_joints)])
    J_reg = jax.nn.softmax(jax.random.normal(ks[1], (n_joints, n_verts)), -1)
    w = jax.nn.softmax(jax.random.normal(ks[2], (n_verts, n_joints)), -1)
    return SMPLModel(
        v_template=v_template,
        shapedirs=jax.random.normal(ks[3], (n_verts, 3, n_betas)) * 0.01,
        posedirs=jax.random.normal(ks[4], (9 * (n_joints - 1),
                                           n_verts * 3)) * 0.01,
        J_regressor=J_reg,
        lbs_weights=w,
        parents=parents,
        faces=np.zeros((1, 3), np.int64),
    )
