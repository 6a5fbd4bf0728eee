"""Native C++ baseline: octree NN correctness vs KD-tree, and the faithful
octree-ICP trajectory vs the NumPy oracle."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from iterativeclosestpoint_tpu.runtime.native import (
    native_available,
    octree_icp_baseline,
    octree_nn_baseline,
)
from iterativeclosestpoint_tpu.utils.oracle import oracle_icp
from iterativeclosestpoint_tpu.utils.synth import make_cloud, make_registration_pair

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_octree_nn_exact():
    tgt = make_cloud(4000, seed=40)
    q = make_cloud(1000, seed=41)
    idx = octree_nn_baseline(tgt, q)
    _, i_ref = cKDTree(tgt).query(q)
    d = np.linalg.norm(tgt[idx] - q, axis=1)
    d_ref = np.linalg.norm(tgt[i_ref] - q, axis=1)
    np.testing.assert_allclose(d, d_ref, atol=1e-12)  # same NN distances


def test_octree_icp_matches_oracle():
    src, tgt, _ = make_registration_pair(n=1500, seed=42, noise_sigma=0.02)
    T, hist, iters, success, _ = octree_icp_baseline(
        src, tgt, max_iterations=25
    )
    ref = oracle_icp(src, tgt, max_iterations=25)
    assert success
    assert iters == len(ref.history)
    np.testing.assert_allclose(
        hist, [h.rmse for h in ref.history], rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(T, ref.transform, atol=1e-8)


def test_octree_icp_recovers_transform():
    src, tgt, T_true = make_registration_pair(n=2000, seed=43)
    T, _, _, success, reg = octree_icp_baseline(
        src, tgt, return_registered=True
    )
    assert success
    np.testing.assert_allclose(T, T_true, atol=1e-4)
    np.testing.assert_allclose(reg, src @ T[:3, :3].T + T[:3, 3], atol=1e-9)
