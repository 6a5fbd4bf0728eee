import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.ops.kabsch import kabsch, kabsch_masked
from iterativeclosestpoint_tpu.utils.oracle import best_fit_transform
from iterativeclosestpoint_tpu.utils.synth import (
    apply_transform_np,
    make_cloud,
    random_rigid_transform,
)


def test_exact_recovery():
    src = make_cloud(500, seed=3)
    T_true = random_rigid_transform(seed=3)
    dst = apply_transform_np(T_true, src)
    T = np.asarray(
        kabsch(jnp.asarray(src), jnp.asarray(dst), accum_dtype=jnp.float64)
    )
    np.testing.assert_allclose(T, T_true, atol=1e-10)


def test_masked_equals_compacted():
    rng = np.random.default_rng(7)
    src = make_cloud(400, seed=7)
    T_true = random_rigid_transform(seed=8)
    dst = apply_transform_np(T_true, src) + rng.normal(0, 0.01, size=src.shape)
    mask = rng.uniform(size=400) > 0.3

    T_masked = np.asarray(
        kabsch_masked(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask, jnp.float64),
            accum_dtype=jnp.float64,
        )
    )
    T_compact = best_fit_transform(src[mask], dst[mask])
    np.testing.assert_allclose(T_masked, T_compact, atol=1e-10)


def test_matches_oracle_kabsch():
    rng = np.random.default_rng(11)
    src = rng.normal(size=(200, 3))
    dst = rng.normal(size=(200, 3))  # unrelated clouds — generic H
    T = np.asarray(
        kabsch(jnp.asarray(src), jnp.asarray(dst), accum_dtype=jnp.float64)
    )
    T_ref = best_fit_transform(src, dst)
    np.testing.assert_allclose(T, T_ref, atol=1e-9)
    R = T[:3, :3]
    assert np.linalg.det(R) > 0  # reflection fix keeps it a proper rotation


def test_reflection_case():
    # Planar degenerate cloud mapped through a reflection-prone fit.
    rng = np.random.default_rng(13)
    src = rng.normal(size=(100, 3))
    src[:, 2] = 0.0
    dst = src.copy()
    dst[:, 0] *= -1  # mirror
    T = np.asarray(
        kabsch(jnp.asarray(src), jnp.asarray(dst), accum_dtype=jnp.float64)
    )
    assert np.linalg.det(T[:3, :3]) > 0
