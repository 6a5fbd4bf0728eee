"""End-to-end pairwise ICP: ground-truth recovery + oracle trajectory parity.

Automates what the reference left manual (test_icp.cpp:278-285: "run the
program and compare the printed matrices by eye")."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.ops.se3 import registration_error, transform_error
from iterativeclosestpoint_tpu.utils.oracle import oracle_icp
from iterativeclosestpoint_tpu.utils.synth import make_registration_pair


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_recovers_known_transform_f64(seed):
    src, tgt, T_true = make_registration_pair(n=4000, seed=seed)
    res = icp_register(src, tgt, dtype=jnp.float64, max_iterations=50)
    assert res.success
    err = float(transform_error(jnp.asarray(res.transform), jnp.asarray(T_true)))
    assert err < 1e-4, f"transform error {err}"


@pytest.mark.parametrize("mode", ["gui", "cli"])
@pytest.mark.parametrize("seed", [0, 3])
def test_matches_oracle_trajectory(mode, seed):
    """Iteration-by-iteration parity with the f64 NumPy oracle."""
    src, tgt, _ = make_registration_pair(n=2000, seed=seed, noise_sigma=0.02)
    res = icp_register(
        src, tgt, dtype=jnp.float64, mode=mode, max_iterations=30, center=False
    )
    ref = oracle_icp(src, tgt, max_iterations=30, mode=mode)

    assert res.iterations == len(ref.history)
    assert res.message == ref.message
    for i, h in enumerate(ref.history):
        assert res.history_valid[i] == h.valid_points, f"iter {i}"
        np.testing.assert_allclose(
            res.history_rmse[i], h.rmse, rtol=1e-9, err_msg=f"iter {i}"
        )
        np.testing.assert_allclose(
            res.history_transform[i], h.transform, atol=1e-9, err_msg=f"iter {i}"
        )
    np.testing.assert_allclose(res.transform, ref.transform, atol=1e-9)
    np.testing.assert_allclose(res.source_registered, ref.source_registered, atol=1e-8)


def test_f32_centered_meets_parity_gate():
    """f32 device math + f64 global offset must stay within the 1e-4 gate
    (BASELINE.md north-star; SURVEY.md §6.1 quirk 9)."""
    src, tgt, T_true = make_registration_pair(n=4000, seed=4)
    # Push clouds to UTM-scale coordinates to stress the offset scheme.
    utm = np.array([500_000.0, 4_000_000.0, 1_200.0])
    res = icp_register(src + utm, tgt + utm, dtype=jnp.float32, max_iterations=50)
    assert res.success
    T_true_utm = T_true.copy()
    R = T_true[:3, :3]
    T_true_utm[:3, 3] = T_true[:3, 3] + utm - R @ utm
    err = float(
        registration_error(
            jnp.asarray(res.transform), jnp.asarray(T_true_utm), jnp.asarray(src + utm)
        )
    )
    assert err < 1e-4, f"f32 registration error {err} m"


def test_outliers_rejected():
    src, tgt, T_true = make_registration_pair(
        n=3000, seed=5, noise_sigma=0.01, outlier_frac=0.05
    )
    res = icp_register(src, tgt, dtype=jnp.float64)
    assert res.success
    err = float(transform_error(jnp.asarray(res.transform), jnp.asarray(T_true)))
    assert err < 5e-3, f"transform error with outliers {err}"
    assert (res.history_outliers[-1] > 0).item()  # 3-sigma actually rejected some


def test_history_replay_consistency():
    """Replay semantics (pointcloudviewer.cpp:86-116): applying the recorded
    cumulative transform of iteration k to the pristine source reproduces
    the engine's source trajectory."""
    src, tgt, _ = make_registration_pair(n=1500, seed=6)
    res = icp_register(src, tgt, dtype=jnp.float64, max_iterations=10)
    assert res.iterations >= 2
    # Last recorded transform applied to pristine source == final cloud
    # (when the loop ended by update, not by converge-record).
    T_last = res.history_transform[-1]
    replayed = src @ T_last[:3, :3].T + T_last[:3, 3]
    if res.stop_reason != 1:  # CONVERGED records previous T; skip equality
        np.testing.assert_allclose(replayed, res.source_registered, atol=1e-8)


def test_too_few_valid_fails_gracefully():
    # Two points cannot support a rigid fit (min-3 guard, icpengine.cpp:319).
    src = np.array([[0.0, 0, 0], [1, 0, 0]])
    tgt = np.array([[100.0, 100, 100], [101, 100, 100]])
    res = icp_register(src, tgt, dtype=jnp.float64, max_iterations=5)
    # 2 valid points < 3 → reference emits finished(false).
    assert res.stop_reason == 3
    assert not res.success


def test_nonfinite_input_stops_with_numerical_error():
    """Device-loop NaN guard (sanitizer analog, SURVEY §5): a NaN
    coordinate must stop the run with an explicit reason instead of
    looping to max_iterations on poisoned statistics (the reference logs
    NaN/Inf distances, icpengine.cpp:208-218)."""
    from iterativeclosestpoint_tpu.models.icp import NUMERICAL_ERROR

    src, tgt, _ = make_registration_pair(n=1000, seed=8)
    src = src.copy()
    src[13, 1] = np.nan
    res = icp_register(src, tgt, dtype=jnp.float64, max_iterations=10)
    assert res.stop_reason == NUMERICAL_ERROR
    assert not res.success
    assert "numerical error" in res.message
    assert res.iterations == 0  # nothing corrupted was recorded


def test_backend_matrix_unsupported_combinations_raise():
    """The backend matrix has no silent second-class cells (round-3
    verdict item 8): test/reference backends reject plane mode with a
    pinned message instead of downgrading."""
    import pytest

    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    src = make_cloud(300, seed=1)
    for backend in ("hashgrid", "cellblock"):
        with pytest.raises(ValueError,
                           match="'bruteforce' or 'pallas'"):
            icp_register(src, src, nn_backend=backend, estimator="plane",
                         max_iterations=1)
    with pytest.raises(ValueError, match="unknown nn_backend"):
        icp_register(src, src, nn_backend="octree", max_iterations=1)
