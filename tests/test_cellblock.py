"""Cell-blocked NN: exactness property tests vs KD-tree (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.ops.cellblock import (
    auto_resolution,
    auto_resolution_data,
    build_cellgrid,
    morton_encode,
    morton_order,
    nn_cellblock,
    nn_cellblock_exact,
)
from iterativeclosestpoint_tpu.utils.synth import make_cloud, make_registration_pair


def _sorted_queries(q, resolution):
    return q[morton_order(q, resolution)]


@pytest.mark.parametrize("kind", ["terrain", "uniform", "sphere"])
def test_certified_results_exact(kind):
    """ICP-realistic density (query ≈ perturbed target): high certification
    rate, and certified ⇒ exact, always."""
    tgt = make_cloud(20000, seed=50, kind=kind)
    rng = np.random.default_rng(0)
    q = tgt + rng.normal(0, 0.03, tgt.shape)
    R = auto_resolution_data(tgt)
    q = _sorted_queries(q, R)

    grid = build_cellgrid(tgt, R, dtype=np.float64)
    idx, dist, cert = nn_cellblock(jnp.asarray(q), grid, resolution=R)
    cert = np.asarray(cert)
    d_ref, i_ref = cKDTree(tgt).query(q)
    assert cert.mean() > 0.9, f"cert rate {cert.mean()}"
    np.testing.assert_allclose(np.asarray(dist)[cert], d_ref[cert], atol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx)[cert], i_ref[cert])


@pytest.mark.parametrize("n_q", [999, 4096, 5001])
def test_exact_variant_always_exact(n_q):
    """Mixed near/far/off-grid queries — every single result must be exact."""
    tgt = make_cloud(6000, seed=51)
    rng = np.random.default_rng(1)
    q = np.vstack(
        [
            tgt[rng.choice(6000, n_q - 200)] + rng.normal(0, 0.02, (n_q - 200, 3)),
            rng.uniform(-150, 150, (200, 3)),  # far outliers
        ]
    )
    q = _sorted_queries(q, 32)
    grid = build_cellgrid(tgt, 32, dtype=np.float64)
    idx, dist = nn_cellblock_exact(
        jnp.asarray(q), jnp.asarray(tgt), grid, resolution=32,
        brute_batch=256, brute_passes=4,
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx), i_ref)


def test_budget_overflow_falls_back_globally():
    """More uncertified queries than the repair budget → global brute."""
    tgt = make_cloud(2000, seed=52)
    rng = np.random.default_rng(2)
    q = rng.uniform(-300, 300, (2000, 3))  # all far → all uncertified
    q = _sorted_queries(q, 16)
    grid = build_cellgrid(tgt, 16, dtype=np.float64)
    idx, dist = nn_cellblock_exact(
        jnp.asarray(q), jnp.asarray(tgt), grid, resolution=16,
        brute_batch=128, brute_passes=2,  # budget 256 < 2000
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-9)


def test_morton_encode_locality():
    cells = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
    codes = morton_encode(cells)
    assert codes[0] == 0
    assert sorted(codes[:4]) == list(codes[:4])  # unit steps are adjacent


def test_auto_resolution_monotone():
    assert auto_resolution(1000) <= auto_resolution(100_000) <= auto_resolution(10_000_000)
    assert 16 <= auto_resolution(100) and auto_resolution(10**8) <= 512


def test_surface_boost_gates():
    """The round-4 fused-kernel resolution boost
    (auto_resolution_data(surface_boost_occupancy=32)): one pow-2 notch
    finer on surface clouds with enough post-boost occupancy, refused
    for volumes (d-gate) and for sparse surfaces (occupancy gate) —
    both refusals pinned because each collapsed the real fine loop when
    measured (tools/exp_res_retune.py, exp_vol_boost.py)."""
    from iterativeclosestpoint_tpu.ops.cellblock import auto_resolution_data
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    # Dense surface (the bench workload shape): boost applies, exactly
    # one notch above base.
    dense = make_cloud(1_000_000, seed=3, extent=100.0)
    r, base = auto_resolution_data(
        dense, surface_boost_occupancy=32, return_base=True
    )
    assert r == 2 * base
    # Default call (normals / cellblock consumers) never boosts.
    assert auto_resolution_data(dense) == base

    # Sparse surface (125x fewer points, same extent): occupancy gate
    # refuses — the boosted grid would drop below 32 pts/occupied cell.
    sparse = make_cloud(8_000, seed=3, extent=100.0)
    r_s, base_s = auto_resolution_data(
        sparse, surface_boost_occupancy=32, return_base=True
    )
    assert r_s == base_s

    # Volume (box dimension ~3): d-gate refuses regardless of density.
    rng = np.random.default_rng(0)
    vol = rng.uniform(-30, 30, (400_000, 3))
    r_v, base_v = auto_resolution_data(
        vol, surface_boost_occupancy=32, return_base=True
    )
    assert r_v == base_v


def test_icp_with_cellblock_matches_bruteforce():
    src, tgt, _ = make_registration_pair(n=3000, seed=53, noise_sigma=0.01)
    res_b = icp_register(src, tgt, dtype=jnp.float64, nn_backend="bruteforce")
    res_c = icp_register(src, tgt, dtype=jnp.float64, nn_backend="cellblock")
    assert res_c.iterations == res_b.iterations
    np.testing.assert_allclose(res_c.transform, res_b.transform, atol=1e-9)
    np.testing.assert_allclose(
        np.sort(res_c.source_registered, axis=0),
        np.sort(res_b.source_registered, axis=0),
        atol=1e-9,
    )
    # Un-permutation restores original row order exactly.
    np.testing.assert_allclose(
        res_c.source_registered, res_b.source_registered, atol=1e-9
    )


def test_icp_cellblock_with_outliers():
    src, tgt, _ = make_registration_pair(
        n=2500, seed=54, noise_sigma=0.01, outlier_frac=0.1
    )
    res_b = icp_register(src, tgt, dtype=jnp.float64, nn_backend="bruteforce")
    res_c = icp_register(src, tgt, dtype=jnp.float64, nn_backend="cellblock")
    assert res_c.iterations == res_b.iterations
    np.testing.assert_allclose(res_c.transform, res_b.transform, atol=1e-9)
