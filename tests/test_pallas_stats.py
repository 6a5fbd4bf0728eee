"""Fused rejection+moments kernel vs the two-pass XLA reference path."""

import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.ops.kabsch import kabsch_masked
from iterativeclosestpoint_tpu.ops.pallas_stats import (
    fused_inlier_moments,
    rigid_from_fused_moments,
)
from iterativeclosestpoint_tpu.utils.synth import (
    apply_transform_np,
    make_cloud,
    random_rigid_transform,
)


def _setup(n=5000, seed=110):
    rng = np.random.default_rng(seed)
    src = make_cloud(n, seed=seed)
    T = random_rigid_transform(seed=seed + 1)
    dst = apply_transform_np(T, src) + rng.normal(0, 0.05, (n, 3))
    dist = np.linalg.norm(dst - src, axis=1)
    weight = np.ones(n)
    weight[-7:] = 0.0  # padding-style rows
    thr = float(np.median(dist))
    return src, dst, dist, weight, thr, T


def test_moments_match_numpy():
    src, dst, dist, weight, thr, _ = _setup()
    cnt, sum_d2, sum_s, sum_t, M = fused_inlier_moments(
        jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
        jnp.asarray(dist, jnp.float32), jnp.asarray(weight, jnp.float32),
        thr, tile=512,
    )
    v = ((dist <= thr) & (weight > 0)).astype(np.float64)
    np.testing.assert_allclose(float(cnt), v.sum())
    np.testing.assert_allclose(float(sum_d2), (v * dist**2).sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sum_s), v @ src, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sum_t), v @ dst, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(M), (src * v[:, None]).T @ dst, rtol=1e-4
    )


def test_rigid_matches_two_pass():
    src, dst, dist, weight, thr, _ = _setup(n=3000, seed=111)
    cnt, _, sum_s, sum_t, M = fused_inlier_moments(
        jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
        jnp.asarray(dist, jnp.float32), jnp.asarray(weight, jnp.float32),
        thr, tile=512,
    )
    T_fused = np.asarray(rigid_from_fused_moments(cnt, sum_s, sum_t, M))
    v = ((dist <= thr) & (weight > 0)).astype(np.float64)
    T_ref = np.asarray(
        kabsch_masked(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(v),
                      accum_dtype=jnp.float64)
    )
    np.testing.assert_allclose(T_fused, T_ref, atol=5e-4)


def test_nonmultiple_tile_padding():
    src, dst, dist, weight, thr, _ = _setup(n=1000, seed=112)
    cnt, *_ = fused_inlier_moments(
        jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
        jnp.asarray(dist, jnp.float32), jnp.asarray(weight, jnp.float32),
        thr, tile=512,  # 1000 → 2 tiles, 24 padded slots
    )
    v = ((dist <= thr) & (weight > 0)).astype(np.float64)
    assert float(cnt) == v.sum()
