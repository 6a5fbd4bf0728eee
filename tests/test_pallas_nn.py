"""Pallas slab-sweep NN kernel: correctness in interpreter mode (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.ops.cellblock import (
    auto_resolution_data,
    morton_order,
)
from iterativeclosestpoint_tpu.ops.pallas_nn import (
    build_pallas_grid,
    nn_colsweep,
    nn_colsweep_exact,
)
from iterativeclosestpoint_tpu.utils.synth import make_cloud, make_registration_pair


@pytest.mark.parametrize("kind", ["terrain", "sphere"])
def test_certified_exact(kind):
    tgt = make_cloud(15000, seed=80, kind=kind)
    rng = np.random.default_rng(0)
    q = tgt + rng.normal(0, 0.03, tgt.shape)
    R = auto_resolution_data(tgt)
    q = q[morton_order(q, R)]
    grid = build_pallas_grid(tgt, R)

    m, _nrm, d, cert = nn_colsweep(jnp.asarray(q, jnp.float32), grid, resolution=R)
    d_ref, i_ref = cKDTree(tgt).query(q)
    cert = np.asarray(cert)
    assert cert.mean() > 0.85, f"cert rate {cert.mean()}"
    np.testing.assert_allclose(np.asarray(d)[cert], d_ref[cert], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(m)[cert], tgt[i_ref][cert], atol=1e-3
    )


def test_exact_variant_with_outliers():
    tgt = make_cloud(5000, seed=81)
    rng = np.random.default_rng(1)
    q = np.vstack(
        [
            tgt + rng.normal(0, 0.02, tgt.shape),
            rng.uniform(-150, 150, (300, 3)),
        ]
    )
    R = auto_resolution_data(tgt)
    q = q[morton_order(q, R)]
    grid = build_pallas_grid(tgt, R)
    m, _nrm, d = nn_colsweep_exact(
        jnp.asarray(q, jnp.float32), jnp.asarray(tgt, jnp.float32), grid,
        resolution=R, brute_batch=512, brute_passes=4,
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m), tgt[i_ref], atol=1e-3)


def test_icp_with_pallas_backend():
    from iterativeclosestpoint_tpu.ops.se3 import registration_error
    import jax.numpy as jnp2

    src, tgt, T_true = make_registration_pair(n=4000, seed=82, noise_sigma=0.01)
    res_b = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce", max_iterations=30
    )
    res_p = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="pallas", max_iterations=30
    )
    assert res_p.success
    # f32 near-tie argmins may differ between the matmul-form (brute) and
    # diff-form (kernel) distance evaluation; gate on registration quality,
    # not bit-equality of the trajectory.
    err_p = float(
        registration_error(
            jnp2.asarray(res_p.transform), jnp2.asarray(T_true), jnp2.asarray(src)
        )
    )
    err_b = float(
        registration_error(
            jnp2.asarray(res_b.transform), jnp2.asarray(T_true), jnp2.asarray(src)
        )
    )
    assert err_p < max(3 * err_b, 1e-3), f"pallas {err_p} vs brute {err_b}"


def test_normals_packed_and_extracted():
    from iterativeclosestpoint_tpu.ops.normals import estimate_normals_cellpca

    tgt = make_cloud(8000, seed=84)
    R = auto_resolution_data(tgt)
    nrm_ref = estimate_normals_cellpca(tgt, R)
    grid = build_pallas_grid(tgt, R, normals=nrm_ref)
    rng = np.random.default_rng(2)
    q = tgt + rng.normal(0, 0.02, tgt.shape)
    q = q[morton_order(q, R)]
    m, nrm, d, cert = nn_colsweep(jnp.asarray(q, jnp.float32), grid, resolution=R)
    cert = np.asarray(cert)
    d_ref, i_ref = cKDTree(tgt).query(q)
    # Matched normals equal the normals of the matched target points.
    np.testing.assert_allclose(
        np.asarray(nrm)[cert], nrm_ref[i_ref][cert], atol=1e-3
    )
