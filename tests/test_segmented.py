"""Segmented dispatch: live progress + cooperative stop (C4/C6 parity).

The reference emits iterationCompleted per iteration and honors a
cooperative stop flag checked each iteration (icpengine.cpp:160-164,
registrationservice.cpp:215-220). The TPU equivalent dispatches the same
compiled loop in slices, carrying the convergence state machine — the
trajectory must be identical to a single dispatch.
"""

import threading

import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.models.icp import (
    STOPPED,
    icp_register,
)
from iterativeclosestpoint_tpu.utils.synth import make_registration_pair


def _pair():
    return make_registration_pair(n=3000, seed=21, noise_sigma=0.01)


def test_segmented_trajectory_identical():
    src, tgt, _ = _pair()
    kw = dict(
        dtype=jnp.float32, nn_backend="bruteforce", max_iterations=12,
        tolerance=1e-9, return_registered=True,
    )
    one = icp_register(src, tgt, **kw)
    seg = icp_register(src, tgt, segment_iterations=5, **kw)

    assert seg.iterations == one.iterations
    assert seg.stop_reason == one.stop_reason
    np.testing.assert_array_equal(seg.history_rmse, one.history_rmse)
    np.testing.assert_array_equal(seg.history_valid, one.history_valid)
    np.testing.assert_allclose(
        seg.history_transform, one.history_transform, rtol=0, atol=0
    )
    np.testing.assert_allclose(
        seg.source_registered, one.source_registered, rtol=0, atol=0
    )


def test_segmented_convergence_across_boundary():
    """Convergence needs 3 consecutive small deltas; split segments so the
    streak straddles a boundary — the carried (prev_error, no_improve)
    must preserve it."""
    src, tgt, _ = _pair()
    kw = dict(
        dtype=jnp.float32, nn_backend="bruteforce", max_iterations=40,
        tolerance=1e-5,
    )
    one = icp_register(src, tgt, **kw)
    for seg_n in (1, 2, 7):
        seg = icp_register(src, tgt, segment_iterations=seg_n, **kw)
        assert seg.iterations == one.iterations, seg_n
        assert seg.message == one.message, seg_n
        np.testing.assert_array_equal(seg.history_rmse, one.history_rmse)


def test_progress_callback_streams_records():
    src, tgt, _ = _pair()
    seen = []
    res = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        max_iterations=9, tolerance=1e-9, segment_iterations=3,
        progress_callback=seen.append,
    )
    assert len(seen) == res.iterations
    assert [r["iteration"] for r in seen] == list(range(1, res.iterations + 1))
    np.testing.assert_allclose(
        [r["rmse"] for r in seen], res.history_rmse, rtol=1e-6
    )
    np.testing.assert_allclose(
        seen[-1]["transform"], res.history_transform[-1], atol=1e-12
    )
    # Records carry the full iterationCompleted payload.
    for key in ("valid_points", "outlier_points", "rotation_angle_deg",
                "translation_norm", "mean_dist", "std_dist", "threshold"):
        assert key in seen[0]


def test_cooperative_stop_between_segments():
    src, tgt, _ = _pair()
    ev = threading.Event()

    def stop_after_first(rec):
        if rec["iteration"] >= 2:
            ev.set()

    res = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        max_iterations=30, tolerance=1e-12, segment_iterations=2,
        progress_callback=stop_after_first, stop_event=ev,
    )
    assert res.stop_reason == STOPPED
    assert res.message == "stopped by user"
    assert not res.success
    assert res.iterations == 2  # stopped at the first segment boundary


def test_midrun_checkpoint_then_resume(tmp_path):
    """A stopped live run leaves a rolling checkpoint that resumes to the
    same place a straight-through run reaches (within drift of the extra
    rebase round-trip)."""
    from iterativeclosestpoint_tpu.runtime.checkpoint import (
        load_checkpoint,
        resume_arguments,
    )
    from iterativeclosestpoint_tpu.runtime.session import RegistrationSession
    from iterativeclosestpoint_tpu.utils.config import ICPConfig

    src, tgt, _ = _pair()
    cfg = ICPConfig(max_iterations=10, tolerance=1e-10,
                    nn_backend="bruteforce")
    sess = RegistrationSession()
    sess.set_clouds(src, tgt)
    ev = sess._stop_event

    real_iter = sess.metrics.iteration

    def stop_at_4(rec, total):
        real_iter(rec, total)
        if rec["iteration"] >= 4:
            ev.set()

    sess.metrics.iteration = stop_at_4
    res1 = sess.run(config=cfg, live_every=2,
                    checkpoint_path=tmp_path / "mid.json")
    assert res1.message == "stopped by user"
    ck = load_checkpoint(tmp_path / "mid.json")
    assert ck["iteration"] == res1.iterations
    assert len(ck["rmse_history"]) == res1.iterations
    np.testing.assert_allclose(
        ck["transform"], res1.history_transform[-1], atol=1e-12
    )

    patch = resume_arguments(ck, cfg.max_iterations)
    res2 = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        tolerance=1e-10, **patch,
    )
    full = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        max_iterations=10, tolerance=1e-10,
    )
    # Resumed trajectory lands near the straight-through one.
    d = np.abs(res2.transform - full.transform)
    assert d.max() < 1e-3, d.max()


def test_checkpoint_resume_bit_identical(tmp_path):
    """Kill a live run mid-way; resume from the rolling checkpoint. The
    concatenated trajectory must equal the uninterrupted run EXACTLY
    (VERDICT W3): the checkpoint carries the full convergence state
    (prev_error, no_improve) plus the local-frame cumulative transform,
    and the loop recomputes the source from the pristine source via the
    carried transform (composed apply), so no information is lost."""
    from iterativeclosestpoint_tpu.runtime.checkpoint import (
        load_checkpoint,
        resume_arguments,
    )
    from iterativeclosestpoint_tpu.runtime.session import RegistrationSession
    from iterativeclosestpoint_tpu.utils.config import ICPConfig

    src, tgt, _ = _pair()
    MAX = 40
    cfg = ICPConfig(max_iterations=MAX, tolerance=1e-5,
                    nn_backend="bruteforce")
    full = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        max_iterations=MAX, tolerance=1e-5,
    )
    assert full.message == "converged"
    assert full.iterations > 7  # the stop must interrupt before the end

    sess = RegistrationSession()
    sess.set_clouds(src, tgt)
    ev = sess._stop_event
    real_iter = sess.metrics.iteration

    def stop_at_6(rec, total):
        real_iter(rec, total)
        if rec["iteration"] >= 6:
            ev.set()

    sess.metrics.iteration = stop_at_6
    res1 = sess.run(config=cfg, live_every=3,
                    checkpoint_path=tmp_path / "c.json")
    assert res1.message == "stopped by user"
    k = res1.iterations
    assert 0 < k < full.iterations

    ck = load_checkpoint(tmp_path / "c.json")
    assert ck["iteration"] == k
    assert "transform_local" in ck and "prev_error" in ck
    patch = resume_arguments(ck, MAX)
    assert "resume_carry" in patch
    res2 = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        tolerance=1e-5, **patch,
    )

    # Converges at the same total iteration with the same reason, and the
    # concatenated per-iteration records are bit-identical.
    assert res2.message == full.message
    assert k + res2.iterations == full.iterations
    np.testing.assert_array_equal(
        np.concatenate([res1.history_rmse, res2.history_rmse]),
        full.history_rmse,
    )
    np.testing.assert_array_equal(
        np.concatenate([res1.history_valid, res2.history_valid]),
        full.history_valid,
    )
    np.testing.assert_array_equal(
        np.concatenate([res1.history_transform, res2.history_transform]),
        full.history_transform,
    )
    np.testing.assert_array_equal(
        res2.source_registered, full.source_registered
    )


def test_resume_legacy_v1_checkpoint(tmp_path):
    """A carry-less (version-1 style) checkpoint still resumes via
    initial_transform with reset convergence counters."""
    import json

    from iterativeclosestpoint_tpu.runtime.checkpoint import (
        load_checkpoint,
        resume_arguments,
    )

    src, tgt, _ = _pair()
    full = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        max_iterations=10, tolerance=1e-10,
    )
    payload = {
        "version": 1,
        "iteration": 4,
        "transform": full.history_transform[3].tolist(),
        "rmse_history": full.history_rmse[:4].tolist(),
        "config": {},
        "source_path": "",
        "target_path": "",
    }
    (tmp_path / "v1.json").write_text(json.dumps(payload))
    patch = resume_arguments(load_checkpoint(tmp_path / "v1.json"), 10)
    assert "initial_transform" in patch and patch["max_iterations"] == 6
    res = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        tolerance=1e-10, **patch,
    )
    d = np.abs(res.transform - full.transform)
    assert d.max() < 1e-3, d.max()


def test_session_request_stop_async():
    from iterativeclosestpoint_tpu.runtime.session import RegistrationSession
    from iterativeclosestpoint_tpu.utils.config import ICPConfig

    src, tgt, _ = _pair()
    sess = RegistrationSession()
    sess.set_clouds(src, tgt)
    started = threading.Event()
    orig_cb = sess.metrics.iteration

    def notice(rec, total):
        started.set()
        return orig_cb(rec, total)

    sess.metrics.iteration = notice
    cfg = ICPConfig(max_iterations=200, tolerance=1e-10,
                    nn_backend="bruteforce")
    th = sess.run_async(config=cfg, live_every=1)
    assert started.wait(timeout=120)
    sess.request_stop()
    th.join(timeout=120)
    assert not th.is_alive()
    assert sess.error is None
    assert sess.result is not None
    assert sess.result.message == "stopped by user"
    assert sess.result.iterations < 200
