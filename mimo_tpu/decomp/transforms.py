"""Rotation representations: axis-angle ⇄ rotation matrix ⇄ quaternion.

Role of the reference's video_decomp/tools/transforms.py (312 LoC of torch
conversions used for HMR2 rotmat→axis-angle fusion and wrist-local pose
computation, video_decomp/run.py:712-779). Pure jnp, batched, jit-safe.
Standard formulas (Rodrigues; Shepperd's method for mat→quat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def aa_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) (Rodrigues)."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    small = angle < 1e-8
    axis = aa / jnp.where(small, 1.0, angle)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)
    a = angle[..., None]
    eye = jnp.eye(3, dtype=aa.dtype)
    eye = jnp.broadcast_to(eye, K.shape)
    R = eye + jnp.sin(a) * K + (1 - jnp.cos(a)) * (K @ K)
    return jnp.where(small[..., None], eye, R)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> unit quaternion (..., 4) wxyz. Branchless Shepperd
    variant: build all four candidates, pick the numerically best."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = 0.5 * safe_sqrt(1.0 + tr)
    qx = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    qy = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    qz = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)

    c0 = jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw),
                    (m10 - m01) / (4 * qw)], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx),
                    (m02 + m20) / (4 * qx)], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy,
                    (m12 + m21) / (4 * qy)], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz),
                    (m12 + m21) / (4 * qz), qz], axis=-1)

    cand = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22,
                        m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_aa(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz -> axis-angle (..., 3)."""
    q = q * jnp.sign(q[..., :1] + 1e-12)  # hemisphere: w >= 0
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)
    axis = xyz / jnp.maximum(norm, 1e-12)
    return axis * angle[..., None]


def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> axis-angle (..., 3) (the reference's mat2aa path,
    video_decomp/run.py:712-730)."""
    return quat_to_aa(rotmat_to_quat(R))


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D continuous rotation rep (Zhou et al.) -> (..., 3, 3). Used by the
    HMR2/HaMeR heads (hmr2 smpl_head rotmat output)."""
    a1, a2 = x[..., 0:3], x[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2).swapaxes(-1, -2)
