import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
from iterativeclosestpoint_tpu.utils.synth import make_cloud


@pytest.mark.parametrize("n,m", [(1000, 1500), (257, 1023), (8, 8), (5000, 5000)])
def test_matches_kdtree(n, m):
    q = make_cloud(n, seed=n, kind="uniform")
    t = make_cloud(m, seed=m + 1, kind="uniform")
    idx, dist = nn_bruteforce(
        jnp.asarray(q), jnp.asarray(t), query_chunk=512, target_tile=256
    )
    d_ref, i_ref = cKDTree(t).query(q, k=1)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-9)
    # Indices may differ only on exact distance ties (measure zero here).
    np.testing.assert_array_equal(np.asarray(idx), i_ref)


def test_nonmatmul_path():
    q = make_cloud(300, seed=1)
    t = make_cloud(400, seed=2)
    idx, dist = nn_bruteforce(jnp.asarray(q), jnp.asarray(t), use_matmul=False)
    d_ref, i_ref = cKDTree(t).query(q, k=1)
    np.testing.assert_array_equal(np.asarray(idx), i_ref)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-9)


def test_f32_distances_close():
    q = make_cloud(2000, seed=5)
    t = make_cloud(2000, seed=6)
    idx, dist = nn_bruteforce(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))
    d_ref, _ = cKDTree(t).query(q, k=1)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-3)
