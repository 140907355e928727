"""Rotation algebra: Euler/quaternion/SO3/6D conversions.

Equivalents of reference `Utils/D6_rotation.py:8-199` (quat<->SO3<->6D per
Zhou et al. 1812.07035, `gaze_to_d6:192`) and the fitting driver's Euler
composition (`FittingSingleImage_new.py:736-766`: R = Rz @ Ry @ Rx).
All jnp, batched, differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def euler_to_rmat(angles: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] (x, y, z) Euler angles -> [B, 3, 3], R = Rz Ry Rx
    (FittingSingleImage_new.py:736-766)."""
    sx, sy, sz = (jnp.sin(angles[:, i]) for i in range(3))
    cx, cy, cz = (jnp.cos(angles[:, i]) for i in range(3))
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    Rx = jnp.stack(
        [o, z, z, z, cx, -sx, z, sx, cx], axis=-1
    ).reshape(-1, 3, 3)
    Ry = jnp.stack(
        [cy, z, sy, z, o, z, -sy, z, cy], axis=-1
    ).reshape(-1, 3, 3)
    Rz = jnp.stack(
        [cz, -sz, z, sz, cz, z, z, z, o], axis=-1
    ).reshape(-1, 3, 3)
    return Rz @ Ry @ Rx


def quat_to_rmat(q: jnp.ndarray) -> jnp.ndarray:
    """[B, 4] (w, x, y, z) -> [B, 3, 3] (D6_rotation.py:24-45)."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            1 - 2 * y ** 2 - 2 * z ** 2, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w,
            2 * x * y + 2 * z * w, 1 - 2 * x ** 2 - 2 * z ** 2, 2 * y * z - 2 * x * w,
            2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x ** 2 - 2 * y ** 2,
        ],
        axis=-1,
    ).reshape(-1, 3, 3)


def rmat_to_d6(R: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, 3] -> [B, 6]: first two columns, column-major
    (D6_rotation.py:48-50 takes [a0.T, a1.T])."""
    return jnp.concatenate([R[:, :, 0], R[:, :, 1]], axis=-1)


def d6_to_rmat(d6: jnp.ndarray) -> jnp.ndarray:
    """[B, 6] -> [B, 3, 3] by Gram-Schmidt (Zhou et al. eq. 15)."""
    a1, a2 = d6[:, :3], d6[:, 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def quat_to_d6(q: jnp.ndarray) -> jnp.ndarray:
    return rmat_to_d6(quat_to_rmat(q))


def rpy_to_rmat(roll, pitch, yaw) -> jnp.ndarray:
    """Scalar roll/pitch/yaw -> [3, 3], R = yaw @ pitch @ roll
    (D6_rotation.py:160-188)."""
    a = jnp.stack([jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw)])
    return euler_to_rmat(a[None])[0]


def gaze_to_d6(face_gaze: jnp.ndarray) -> jnp.ndarray:
    """[2] (pitch, yaw) normalized gaze -> [6] rotation rep
    (D6_rotation.py:192-199)."""
    R = rpy_to_rmat(0.0, face_gaze[0], face_gaze[1])
    return rmat_to_d6(R[None])[0]
