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


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (3,) axis-angle → (3,3) rotation.

    Every branch is evaluated on *safe* inputs (double-where pattern) so
    forward/reverse autodiff through θ = 0 stays finite — the pose-graph
    Gauss-Newton differentiates through these maps at the identity.
    """
    t2 = jnp.sum(w * w)
    small = t2 < 1e-14
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    W = _skew(w)
    return jnp.eye(3, dtype=w.dtype) + A * W + B * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(3,3) rotation → (3,) axis-angle via atan2 (smooth at identity).

    Valid for θ well below π (pose-graph edges are small relative motions);
    the θ ≈ π antipode is outside this parameterization's support.
    """
    s_vec = 0.5 * jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]], R.dtype
    )  # sinθ · axis
    s2 = jnp.sum(s_vec * s_vec)  # sin²θ
    c = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    small = s2 < 1e-14
    sin_safe = jnp.sqrt(jnp.where(small, 1.0, s2))
    theta = jnp.arctan2(sin_safe, c)
    # θ/sinθ: smooth series in sin²θ near 0.
    factor = jnp.where(small, 1.0 + s2 / 6.0, theta / sin_safe)
    return factor * s_vec


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(6,) twist [v, w] → (4,4) transform (V-matrix form, autodiff-safe)."""
    v = xi[:3]
    w = xi[3:]
    t2 = jnp.sum(w * w)
    small = t2 < 1e-14
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    W = _skew(w)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    C = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0, (theta - jnp.sin(theta)) / (t2s * theta)
    )
    V = jnp.eye(3, dtype=xi.dtype) + B * W + C * (W @ W)
    return make_transform(so3_exp(w), V @ v)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(4,4) transform → (6,) twist [v, w] (autodiff-safe near identity)."""
    w = so3_log(T[:3, :3])
    t2 = jnp.sum(w * w)
    small = t2 < 1e-14
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    W = _skew(w)
    # V⁻¹ = I - W/2 + coef·W², coef = 1/θ² − (1+cosθ)/(2θ sinθ).
    sin_safe = jnp.where(small, 1.0, jnp.sin(theta))
    coef = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        1.0 / t2s - (1.0 + jnp.cos(theta)) / (2.0 * theta * sin_safe),
    )
    Vinv = jnp.eye(3, dtype=T.dtype) - 0.5 * W + coef * (W @ W)
    return jnp.concatenate([Vinv @ T[:3, 3], w])


def _skew(w: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros((), w.dtype)
    return jnp.array(
        [[z, -w[2], w[1]], [w[2], z, -w[0]], [-w[1], w[0], z]]
    )


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
