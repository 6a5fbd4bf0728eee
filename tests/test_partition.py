"""Spatially partitioned target (x-slabs + halo) on the virtual mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.ops.se3 import registration_error
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh
from iterativeclosestpoint_tpu.parallel.partition import (
    build_partition,
    icp_register_partitioned,
)
from iterativeclosestpoint_tpu.utils.synth import make_registration_pair


def test_build_partition_covers_target():
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-50, 50, (10_000, 3))
    part = build_partition(tgt, n_dev=4, halo=2.0)
    buf = np.asarray(part.halo_pts)
    assert buf.shape[0] == 4
    # Every target point appears in at least one device's slab.
    total_real = (buf[..., 0] < 1e5).sum()
    assert total_real >= 10_000  # halo duplicates push it above N
    # Slab x-limits overlap by 2*halo between neighbors.
    lo = np.asarray(part.x_lo)
    hi = np.asarray(part.x_hi)
    assert np.all(hi[:-1] - lo[1:] >= 2.0 * 2.0 - 1e-6)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_partitioned_matches_single_device(n_dev):
    src, tgt, _ = make_registration_pair(n=3000, seed=130, noise_sigma=0.01)
    mesh = make_mesh(n_devices=n_dev)
    res_1 = icp_register(
        src, tgt, dtype=jnp.float64, nn_backend="bruteforce", max_iterations=20
    )
    res_p = icp_register_partitioned(
        src, tgt, mesh=mesh, dtype=jnp.float64, max_iterations=20
    )
    assert res_p.iterations == res_1.iterations
    np.testing.assert_array_equal(res_p.history_valid, res_1.history_valid)
    np.testing.assert_allclose(res_p.history_rmse, res_1.history_rmse,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(res_p.transform, res_1.transform, atol=1e-9)
    np.testing.assert_allclose(
        res_p.source_registered, res_1.source_registered, atol=1e-9
    )


def test_tiny_halo_forces_collective_repair():
    """With a halo far below typical NN distances the margin certificate
    fails everywhere; the all_gather/pmin repair must still be exact."""
    src, tgt, T_true = make_registration_pair(n=800, seed=131)
    mesh = make_mesh(n_devices=4)
    res = icp_register_partitioned(
        src, tgt, mesh=mesh, dtype=jnp.float64, halo=1e-4,
        repair_budget=256, max_iterations=25,
    )
    res_1 = icp_register(
        src, tgt, dtype=jnp.float64, nn_backend="bruteforce", max_iterations=25
    )
    # Near machine-precision convergence the 1.1x divergence stop can fire
    # one iteration apart (ulp-level repair-path differences); compare the
    # common RMSE prefix and the recovered transform instead.
    k = min(res.iterations, res_1.iterations)
    np.testing.assert_allclose(
        res.history_rmse[:k], res_1.history_rmse[:k], rtol=1e-9, atol=1e-12
    )
    err = float(registration_error(
        jnp.asarray(res.transform), jnp.asarray(T_true), jnp.asarray(src)
    ))
    assert err < 1e-4
