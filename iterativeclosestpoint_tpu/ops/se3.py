"""SE(3) rigid-transform utilities on (4,4) homogeneous matrices.

TPU-native equivalent of the reference's transform plumbing
(``PointCloudRegistration/core/pointcloud.cpp:73-105`` applyTransform /
applyTransformMatrix, and the 4x4 accumulation at
``PointCloudRegistration/core/icpengine.cpp:342-346``).

Points are ``(N, 3)`` arrays; transforms are ``(4, 4)`` row-major
homogeneous matrices so that ``p' = R @ p + t`` with ``R = T[:3,:3]``,
``t = T[:3,3]``. Everything is shape-polymorphic, jit-safe and vectorized —
no per-point loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Full-f32 matmul precision: point coordinates rounded through bf16 MXU
# passes would perturb the ICP trajectory beyond the parity gate.
_HI = jax.lax.Precision.HIGHEST


def identity_transform(dtype=jnp.float32) -> jnp.ndarray:
    """(4,4) identity transform."""
    return jnp.eye(4, dtype=dtype)


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble a (4,4) homogeneous transform from (3,3) R and (3,) t."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t.astype(R.dtype))
    return T


def compose(T_new: jnp.ndarray, T_old: jnp.ndarray) -> jnp.ndarray:
    """Accumulate: returns T_new @ T_old (apply T_old first, then T_new).

    Matches the accumulation order ``T_cumulative = T * T_cumulative`` of the
    reference engine (icpengine.cpp:342).
    """
    return T_new @ T_old


def apply_transform(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a (4,4) rigid transform to (..., 3) points: p' = R p + t.

    One fused matmul on the MXU instead of the reference's per-point loop
    (pointcloud.cpp:88-105).
    """
    R = T[:3, :3]
    t = T[:3, 3]
    return jnp.dot(points, R.T, precision=_HI) + t


def rotation_angle_deg(T: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle (degrees) of the transform, from the trace formula.

    Same metric the reference records per iteration
    (icpengine.cpp:360-361): ``acos((trace(R) - 1) / 2)`` in degrees.
    The argument is clipped to [-1, 1] to guard against fp round-off.
    """
    R = T[:3, :3]
    c = (jnp.trace(R) - 1.0) / 2.0
    return jnp.degrees(jnp.arccos(jnp.clip(c, -1.0, 1.0)))


def translation_norm(T: jnp.ndarray) -> jnp.ndarray:
    """Euclidean norm of the translation part (icpengine.cpp:362)."""
    return jnp.linalg.norm(T[:3, 3])


def se3_from_euler(
    yaw_deg, pitch_deg, roll_deg, tx, ty, tz, dtype=jnp.float32
) -> jnp.ndarray:
    """Build an SE(3) transform from Z-Y-X Euler angles (degrees) + translation.

    Rotation convention matches the reference's test-data generator
    (``test_icp.cpp:165-189``): R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
    """
    yaw = jnp.radians(jnp.asarray(yaw_deg, dtype))
    pitch = jnp.radians(jnp.asarray(pitch_deg, dtype))
    roll = jnp.radians(jnp.asarray(roll_deg, dtype))

    cz, sz = jnp.cos(yaw), jnp.sin(yaw)
    cy, sy = jnp.cos(pitch), jnp.sin(pitch)
    cx, sx = jnp.cos(roll), jnp.sin(roll)

    Rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]], dtype)
    Ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]], dtype)
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]], dtype)

    R = Rz @ Ry @ Rx
    t = jnp.array([tx, ty, tz], dtype)
    return make_transform(R, t)


def invert_transform(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform: [Rᵀ, -Rᵀt]."""
    R = T[:3, :3]
    t = T[:3, 3]
    Rt = R.T
    return make_transform(Rt, -(Rt @ t))


def transform_error(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """Scalar discrepancy between two rigid transforms.

    max(|R_a - R_b|) + max(|t_a - t_b|); used for the <1e-4 parity gate
    against the reference (BASELINE.md north-star targets).
    """
    dR = jnp.max(jnp.abs(T_a[:3, :3] - T_b[:3, :3]))
    dt = jnp.max(jnp.abs(T_a[:3, 3] - T_b[:3, 3]))
    return dR + dt


def registration_error(T_a, T_b, points) -> jnp.ndarray:
    """Max displacement (metres) between the two maps evaluated at the cloud.

    The lever-arm-free parity metric: comparing raw matrix entries at
    UTM-scale coordinates multiplies rotation error by the ~1e6 m offset,
    which says nothing about registration quality; the displacement of the
    actual points is the physically meaningful discrepancy.
    """
    pa = apply_transform(T_a, points)
    pb = apply_transform(T_b, points)
    return jnp.max(jnp.linalg.norm(pa - pb, axis=-1))
