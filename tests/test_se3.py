import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.ops import se3


def test_identity_apply():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(100, 3)))
    out = se3.apply_transform(se3.identity_transform(pts.dtype), pts)
    np.testing.assert_allclose(out, pts)


def test_compose_matches_sequential_apply():
    rng = np.random.default_rng(1)
    T1 = np.asarray(se3.se3_from_euler(5.0, -3.0, 2.0, 1.0, -2.0, 0.5, jnp.float64))
    T2 = np.asarray(se3.se3_from_euler(-8.0, 1.0, 4.0, -0.3, 0.7, 1.1, jnp.float64))
    pts = rng.normal(size=(50, 3))
    a = se3.apply_transform(jnp.asarray(T2 @ T1), jnp.asarray(pts))
    b = se3.apply_transform(
        jnp.asarray(T2), se3.apply_transform(jnp.asarray(T1), jnp.asarray(pts))
    )
    np.testing.assert_allclose(a, b, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(se3.compose(jnp.asarray(T2), jnp.asarray(T1))), T2 @ T1
    )


def test_invert_roundtrip():
    T = se3.se3_from_euler(10.0, 5.0, -5.0, 2.5, -2.5, 1.0, jnp.float64)
    I = se3.compose(se3.invert_transform(T), T)
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-12)


def test_rotation_angle_and_translation():
    T = se3.se3_from_euler(7.0, 0.0, 0.0, 3.0, 4.0, 0.0, jnp.float64)
    assert abs(float(se3.rotation_angle_deg(T)) - 7.0) < 1e-9
    assert abs(float(se3.translation_norm(T)) - 5.0) < 1e-12


def test_rotation_matrix_orthonormal():
    T = np.asarray(se3.se3_from_euler(10.0, -5.0, 5.0, 0.0, 0.0, 0.0, jnp.float64))
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1.0) < 1e-12
