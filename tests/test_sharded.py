"""Multi-chip data-parallel ICP on an 8-device virtual CPU mesh
(SURVEY.md §4: distributed logic tested without a TPU pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh, pad_to_multiple
from iterativeclosestpoint_tpu.parallel.sharded import icp_register_sharded
from iterativeclosestpoint_tpu.utils.oracle import oracle_icp
from iterativeclosestpoint_tpu.utils.synth import make_registration_pair


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_pad_to_multiple():
    x = np.arange(10, dtype=np.float64).reshape(5, 2)
    padded, w = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2)
    np.testing.assert_array_equal(w, [1, 1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(padded[:5], x)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_matches_single_device(n_dev):
    """The sharded trajectory must be numerically identical (f64) to the
    single-device path — same history, same transforms."""
    src, tgt, _ = make_registration_pair(n=2001, seed=30, noise_sigma=0.02)
    mesh = make_mesh(n_devices=n_dev)

    res_1 = icp_register(src, tgt, dtype=jnp.float64, max_iterations=20)
    res_n = icp_register_sharded(
        src, tgt, mesh=mesh, dtype=jnp.float64, max_iterations=20
    )
    assert res_n.iterations == res_1.iterations
    assert res_n.message == res_1.message
    np.testing.assert_array_equal(res_n.history_valid, res_1.history_valid)
    np.testing.assert_allclose(res_n.history_rmse, res_1.history_rmse, rtol=1e-12)
    np.testing.assert_allclose(res_n.transform, res_1.transform, atol=1e-12)
    np.testing.assert_allclose(
        res_n.source_registered, res_1.source_registered, atol=1e-10
    )


def test_sharded_matches_oracle():
    src, tgt, _ = make_registration_pair(n=1000, seed=31)
    mesh = make_mesh(n_devices=8)
    res = icp_register_sharded(
        src, tgt, mesh=mesh, dtype=jnp.float64, max_iterations=25, center=False
    )
    ref = oracle_icp(src, tgt, max_iterations=25)
    assert res.iterations == len(ref.history)
    for i, h in enumerate(ref.history):
        assert res.history_valid[i] == h.valid_points
        np.testing.assert_allclose(res.history_rmse[i], h.rmse, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(res.transform, ref.transform, atol=1e-9)


def test_sharded_hashgrid_backend():
    src, tgt, _ = make_registration_pair(n=1500, seed=32, noise_sigma=0.01)
    mesh = make_mesh(n_devices=4)
    res_g = icp_register_sharded(
        src, tgt, mesh=mesh, dtype=jnp.float64, nn_backend="hashgrid"
    )
    res_b = icp_register(src, tgt, dtype=jnp.float64, nn_backend="bruteforce")
    assert res_g.iterations == res_b.iterations
    np.testing.assert_allclose(res_g.transform, res_b.transform, atol=1e-9)
