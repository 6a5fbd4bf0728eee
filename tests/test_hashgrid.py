"""Voxel-hash grid NN: property tests vs brute force / KD-tree (the test
strategy SURVEY.md §4 prescribes for the octree replacement)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.ops.hashgrid import (
    build_hashgrid,
    choose_capacity,
    nn_hashgrid,
    nn_hybrid,
)
from iterativeclosestpoint_tpu.ops.se3 import transform_error
from iterativeclosestpoint_tpu.utils.synth import make_cloud, make_registration_pair


@pytest.mark.parametrize("kind", ["terrain", "uniform", "sphere"])
def test_grid_exact_when_certified(kind):
    tgt = make_cloud(5000, seed=10, kind=kind)
    # Queries near the target surface → small NN distances → certified.
    rng = np.random.default_rng(0)
    q = tgt[rng.choice(5000, 2000)] + rng.normal(0, 0.05, size=(2000, 3))

    grid, K = build_hashgrid(tgt, resolution=32, dtype=np.float64)
    idx, dist, cert = nn_hashgrid(
        jnp.asarray(q), grid, resolution=32, capacity=K
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    cert = np.asarray(cert)
    assert cert.mean() > 0.99
    np.testing.assert_allclose(np.asarray(dist)[cert], d_ref[cert], atol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx)[cert], i_ref[cert])


def test_hybrid_always_exact():
    """Hybrid = grid + brute fallback must be exact even for far queries."""
    tgt = make_cloud(3000, seed=11)
    rng = np.random.default_rng(1)
    # Mix of near and far (off-grid) queries → certificate fails somewhere.
    q = np.vstack(
        [
            tgt[rng.choice(3000, 500)] + rng.normal(0, 0.02, (500, 3)),
            rng.uniform(-200, 200, (100, 3)),
        ]
    )
    grid, K = build_hashgrid(tgt, resolution=32, dtype=np.float64)
    idx, dist = nn_hybrid(
        jnp.asarray(q), jnp.asarray(tgt), grid, resolution=32, capacity=K
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx), i_ref)


def test_overflow_cells_handled():
    """A dense cluster overflowing cell capacity must still be searched."""
    rng = np.random.default_rng(2)
    cluster = rng.normal(0, 0.01, size=(500, 3))  # all in ~one cell
    spread = rng.uniform(-10, 10, size=(500, 3))
    tgt = np.vstack([cluster, spread])
    grid, K = build_hashgrid(tgt, resolution=16, capacity=4, dtype=np.float64)
    assert np.asarray(grid.overflow_pts).shape[0] >= 496  # cluster overflowed
    q = cluster + rng.normal(0, 0.001, size=cluster.shape)
    idx, dist = nn_hybrid(
        jnp.asarray(q), jnp.asarray(tgt), grid, resolution=16, capacity=4
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-9)


def test_choose_capacity():
    counts = np.array([1, 5, 100, 3])
    assert choose_capacity(counts, overflow_cap=0) == 100
    assert choose_capacity(counts, overflow_cap=95) == 5
    assert choose_capacity(counts, overflow_cap=10**9) == 1


def test_icp_with_hashgrid_backend_matches_bruteforce():
    src, tgt, T_true = make_registration_pair(n=3000, seed=20, noise_sigma=0.01)
    res_b = icp_register(src, tgt, dtype=jnp.float64, nn_backend="bruteforce")
    res_g = icp_register(src, tgt, dtype=jnp.float64, nn_backend="hashgrid")
    assert res_g.success
    assert res_g.iterations == res_b.iterations
    np.testing.assert_allclose(res_g.transform, res_b.transform, atol=1e-9)
    err = float(
        transform_error(jnp.asarray(res_g.transform), jnp.asarray(T_true))
    )
    assert err < 1e-3
