"""Coarse-to-fine multiscale ICP (BASELINE config 4 pattern)."""

import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.models.multiscale import icp_register_multiscale
from iterativeclosestpoint_tpu.ops.se3 import registration_error
from iterativeclosestpoint_tpu.utils.synth import make_registration_pair


def test_multiscale_recovers_transform():
    src, tgt, T_true = make_registration_pair(n=20000, seed=90, noise_sigma=0.01)
    res = icp_register_multiscale(
        src, tgt, coarse_max_points=2000, dtype=jnp.float64,
        max_iterations=30, return_registered=False,
    )
    assert res.success
    assert len(res.levels) == 2
    assert res.levels[0][0] > 1 and res.levels[-1][0] == 1
    err = float(
        registration_error(
            jnp.asarray(res.transform), jnp.asarray(T_true), jnp.asarray(src)
        )
    )
    assert err < 1e-3, f"registration error {err}"


def test_initial_transform_composition():
    """Fine level with a coarse init must outperform/equal a cold start in
    residual misalignment, and transforms must compose correctly."""
    src, tgt, T_true = make_registration_pair(n=3000, seed=91)
    coarse = icp_register(
        src[::10], tgt[::10], dtype=jnp.float64, max_iterations=10,
        return_registered=False,
    )
    fine = icp_register(
        src, tgt, dtype=jnp.float64, initial_transform=coarse.transform,
        max_iterations=30,
    )
    assert fine.success
    err = float(
        registration_error(
            jnp.asarray(fine.transform), jnp.asarray(T_true), jnp.asarray(src)
        )
    )
    assert err < 1e-3
    # Registered cloud equals source mapped by the *composed* transform.
    mapped = src @ fine.transform[:3, :3].T + fine.transform[:3, 3]
    np.testing.assert_allclose(mapped, fine.source_registered, atol=1e-6)


def test_explicit_stride_pyramid():
    src, tgt, T_true = make_registration_pair(n=8000, seed=92, noise_sigma=0.02)
    res = icp_register_multiscale(
        src, tgt, strides=(16, 4, 1), dtype=jnp.float64,
        max_iterations=20, return_registered=False,
    )
    assert res.success
    assert [s for s, _ in res.levels] == [16, 4, 1]
    err = float(
        registration_error(
            jnp.asarray(res.transform), jnp.asarray(T_true), jnp.asarray(src)
        )
    )
    assert err < 5e-3


def test_overlapped_device_prep_parity():
    """The overlapped-prep fine path (device_data + prepared_nn: uploads
    started before the coarse pass, coarse transform applied on device,
    grid + query layout built in one fused dispatch) must agree with the
    plain host-prep pallas path to f32 roundoff."""
    src, tgt, T_true = make_registration_pair(n=4000, seed=94, noise_sigma=0.01)
    kw = dict(
        coarse_max_points=800, dtype=jnp.float32, max_iterations=12,
        nn_backend="pallas", grid_resolution=8,
    )
    fast = icp_register_multiscale(src, tgt, overlap_device_prep=True, **kw)
    ref = icp_register_multiscale(src, tgt, overlap_device_prep=False, **kw)
    assert fast.success and ref.success
    err = float(
        registration_error(
            jnp.asarray(fast.transform, jnp.float64),
            jnp.asarray(ref.transform, jnp.float64),
            jnp.asarray(src),
        )
    )
    assert err < 1e-4, f"overlap vs host-prep divergence {err}"
    # Registered cloud comes back in original row order despite the
    # on-device layout/gather (apply_permutation round-trip).
    mapped = src @ fast.transform[:3, :3].T + fast.transform[:3, 3]
    assert fast.final.source_registered is not None
    np.testing.assert_allclose(
        mapped, fast.final.source_registered, atol=1e-3
    )


def test_multiscale_sharded_fine_level():
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh

    src, tgt, T_true = make_registration_pair(n=6000, seed=93, noise_sigma=0.01)
    res = icp_register_multiscale(
        src, tgt, coarse_max_points=1000, dtype=jnp.float64,
        mesh=make_mesh(n_devices=4), max_iterations=25,
        nn_backend="bruteforce", return_registered=False,
    )
    assert res.success
    err = float(
        registration_error(
            jnp.asarray(res.transform), jnp.asarray(T_true), jnp.asarray(src)
        )
    )
    assert err < 1e-3, f"registration error {err}"


def test_multiscale_mesh_overlap_prep_matches():
    """Under a mesh, the fine level reuses the overlapped device grids
    (round-1 W8: it used to re-pay host builds); trajectory must match
    the host-built path."""
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh

    src, tgt, _ = make_registration_pair(n=4000, seed=40, noise_sigma=0.01,
                                         kind="terrain")
    mesh = make_mesh(n_devices=4)
    kw = dict(mesh=mesh, dtype=jnp.float32, nn_backend="pallas",
              max_iterations=8, tolerance=1e-9, coarse_max_points=1000)
    r_host = icp_register_multiscale(src, tgt, overlap_device_prep=False,
                                     **kw)
    r_dev = icp_register_multiscale(src, tgt, overlap_device_prep=True,
                                    **kw)
    assert r_dev.final.iterations == r_host.final.iterations
    np.testing.assert_allclose(r_dev.final.history_rmse,
                               r_host.final.history_rmse, rtol=1e-4)
    np.testing.assert_allclose(r_dev.transform, r_host.transform, atol=1e-4)
    np.testing.assert_allclose(
        r_dev.final.source_registered, r_host.final.source_registered,
        atol=1e-4,
    )


def test_two_stage_boosted_fine_plane():
    """Round-5 two-stage boosted fine level: plane-mode clouds whose
    surface boost is refused by the 32 pts/cell occupancy gate (but
    clear the 16 pts/cell floor) run a short base-resolution stage to
    converge the pose, then continue on the boosted grid through
    resume_carry + layout_transform — one logical registration (the
    10M measurement behind it: tools/exp_10m_handoff.py, 43M vs 27.6M
    pts/s). 25k terrain sits exactly in that regime (base R=16,
    post-boost occupancy in [16, 32))."""
    from iterativeclosestpoint_tpu.ops.cellblock import (
        auto_resolution_data,
        surface_boost_ok,
    )
    from iterativeclosestpoint_tpu.ops.se3 import registration_error

    src, tgt, T_true = make_registration_pair(
        n=25_000, seed=21, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    # Construction guard: boost refused at 32, allowed at 16.
    r, base = auto_resolution_data(
        tgt, surface_boost_occupancy=32, return_base=True
    )
    assert r == base and surface_boost_ok(tgt, 2 * base, occupancy=16)

    kw = dict(dtype=jnp.float32, nn_backend="pallas", estimator="plane",
              coarse_max_points=3000, coarse_iterations=10)
    res = icp_register_multiscale(src, tgt, max_iterations=12,
                                  tolerance=0.0, **kw)
    # Stage 2 ran on the boosted grid; history is one registration.
    assert res.final.nn_resolution == 2 * base, res.final.nn_resolution
    assert res.final.iterations == 12
    assert len(res.final.history_rmse) == 12
    assert np.all(np.diff(res.final.history_rmse)[:4] <= 1e-6)  # sane
    err = float(registration_error(
        jnp.asarray(res.transform), jnp.asarray(T_true), jnp.asarray(src)
    ))
    assert err < 1e-2, err

    # Single-stage reference at the base resolution: same convergence.
    ref = icp_register_multiscale(src, tgt, max_iterations=12,
                                  tolerance=0.0, grid_resolution=base,
                                  **kw)
    assert ref.final.nn_resolution == base
    err_x = float(registration_error(
        jnp.asarray(res.transform), jnp.asarray(ref.transform),
        jnp.asarray(src)
    ))
    assert err_x < 1e-3, err_x

    # max_iterations <= K: single-stage path, base resolution.
    res_s = icp_register_multiscale(src, tgt, max_iterations=4,
                                    tolerance=0.0, **kw)
    assert res_s.final.nn_resolution == base

    # Early convergence inside stage 1: result is stage 1's, with the
    # registered cloud still delivered.
    res_e = icp_register_multiscale(src, tgt, max_iterations=12,
                                    tolerance=1.0, **kw)
    assert res_e.final.iterations < 5
    assert res_e.final.nn_resolution == base
    assert res_e.final.source_registered is not None
    assert res_e.final.source_registered.shape == src.shape


def test_two_stage_segment_callback_iterations_consecutive():
    """Segment callbacks (the rolling-checkpoint hook) must see ONE
    consecutive iteration numbering across the two-stage boundary —
    stage 2's states are offset by the pre-rung length so a --resume
    from any checkpoint lands at the right remaining-iteration count."""
    seen = []

    src, tgt, _ = make_registration_pair(
        n=25_000, seed=21, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    res = icp_register_multiscale(
        src, tgt, dtype=jnp.float32, nn_backend="pallas",
        estimator="plane", coarse_max_points=3000, coarse_iterations=10,
        max_iterations=9, tolerance=0.0, segment_iterations=2,
        segment_callback=lambda st: seen.append(st["iteration"]),
        return_registered=False,
    )
    assert res.final.iterations == 9
    # Stage 1 (5 iters, segments of 2): 2, 4, 5; stage 2 (4 iters,
    # offset +5): 7, 9.
    assert seen == [2, 4, 5, 7, 9], seen
