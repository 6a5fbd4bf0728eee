"""Pairwise ICP: the masked ``lax.while_loop`` driver.

TPU-native re-design of the reference engine's iteration loop
(``PointCloudRegistration/core/icpengine.cpp:117-394``; CLI twin
``icp_registration.cpp:443-622``). One ICP iteration is:

  1-NN correspondence (target structure built once; the source moves,
  icpengine.cpp:122) → distances → population mean/σ over all pairs →
  3-sigma threshold (gui mode widens iteration 1: mean + max(3σ, 0.5·mean),
  icpengine.cpp:249-255) → inlier mask → RMSE over inliers only (:273-278)
  → convergence (|ΔRMSE| < tol three consecutive iterations, :286-306) and
  divergence (RMSE > 1.1·prev, :311-314) checks, both *before* the pose
  update → masked Kabsch → T_cum = T·T_cum (:342) → transform source.

Where the reference runs data-dependent C++ control flow with dynamic
inlier subsets, this driver is a single compiled ``lax.while_loop`` over
fixed-shape state: the inlier set is a 0/1 mask folded into every
reduction, convergence counters ride in the loop carry exactly like the
reference's ``no_improvement_count``/``prev_error`` locals
(icpengine.cpp:156-157), and the full per-iteration history (RMSE, counts,
cumulative transform, rotation angle, translation norm — what the GUI
records at icpengine.cpp:349-364) is written into preallocated device
arrays, enabling the viewer-style iteration replay as a pure function.

Numerical scheme: coordinates are centered on host by an f64 global offset
(UTM-scale LAS coordinates decompose into offset + local frame exactly as
the LAS format itself does), and device math runs in f32 by default; the
recovered transform is re-based to world frame on the way out.

Documented deviations from the reference:
  * (SURVEY.md §6.1 quirk 5) on the converge path the reference leaves
    the recorded rotation-angle/translation fields uninitialized; we
    compute them from the recorded (previous) cumulative transform.
  * the reference transforms the *evolving* source each iteration
    (icpengine.cpp:371-375, src ← T·src); this driver recomputes the
    current source from the PRISTINE source and the cumulative transform
    (src_i = T_cum_i · src_0) every iteration. Identical in exact
    arithmetic (f64 trajectories agree to ~1e-13), numerically better
    (no per-apply error accumulation), and it makes the iteration state
    a pure function of (T_cum, prev_error, no_improve) — so segmented
    dispatch and checkpoint resume are bit-identical to one long
    dispatch BY CONSTRUCTION: restarting with a carried T_cum reproduces
    exactly the source the uninterrupted loop would have computed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.utils import hostmath

from iterativeclosestpoint_tpu.ops.kabsch import rigid_from_covariance
from iterativeclosestpoint_tpu.ops.se3 import apply_transform, se3_exp
from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
from iterativeclosestpoint_tpu.runtime.timing import stage

# Stop reasons (host-readable).
RUNNING = 0
CONVERGED = 1
DIVERGED = 2
TOO_FEW_VALID = 3
MAX_ITERATIONS = 4
STOPPED = 5  # cooperative user stop (registrationservice.cpp:215-220)
NUMERICAL_ERROR = 6  # non-finite statistics/pose (icpengine.cpp:208-218
#                      logs NaN/Inf distances; here it is a stop reason —
#                      the device-loop NaN guard, SURVEY §5 sanitizers)

_STOP_MESSAGES = {
    CONVERGED: "converged",
    DIVERGED: "diverged",
    TOO_FEW_VALID: "insufficient valid pairs",
    MAX_ITERATIONS: "max iterations reached",
    STOPPED: "stopped by user",
    NUMERICAL_ERROR: "numerical error (non-finite statistics or pose)",
}


@dataclasses.dataclass
class ICPResult:
    """Host-side result mirroring the reference's ICPResult + history
    (icpengine.h:36-60)."""

    success: bool
    message: str
    transform: np.ndarray  # (4,4) world-frame cumulative transform
    rmse: float
    iterations: int
    stop_reason: int
    # Per-iteration history, length == iterations (trimmed).
    history_rmse: np.ndarray
    history_valid: np.ndarray
    history_outliers: np.ndarray
    history_transform: np.ndarray  # (iterations, 4, 4) world frame
    history_rotation_deg: np.ndarray
    history_translation: np.ndarray
    history_mean_dist: np.ndarray
    history_std_dist: np.ndarray
    history_threshold: np.ndarray
    source_registered: Optional[np.ndarray] = None  # (N,3) world frame
    # Final convergence carry (prev_error / no_improvement_count locals,
    # icpengine.cpp:156-157) — with ``transform`` these make a checkpoint
    # from which ``resume_carry`` continues bit-identically.
    carry_prev_error: float = 1e10
    carry_no_improve: int = 0
    # Local-frame cumulative transform + centering offset (the exact loop
    # state; None when the run had an initial_transform folded in).
    carry_transform_local: Optional[np.ndarray] = None
    center_offset: Optional[np.ndarray] = None
    # Resolved NN grid resolution (cells/axis) — the observable effect of
    # the grid_resolution config knob; None for gridless backends.
    nn_resolution: Optional[int] = None

    def iteration_records(self):
        """History as a list of dicts (the iterationCompleted payload)."""
        return [
            {
                "iteration": i + 1,
                "rmse": float(self.history_rmse[i]),
                "valid_points": int(self.history_valid[i]),
                "outlier_points": int(self.history_outliers[i]),
                "transform": self.history_transform[i],
                "rotation_angle_deg": float(self.history_rotation_deg[i]),
                "translation_norm": float(self.history_translation[i]),
                "mean_dist": float(self.history_mean_dist[i]),
                "std_dist": float(self.history_std_dist[i]),
                "threshold": float(self.history_threshold[i]),
            }
            for i in range(self.iterations)
        ]


def iteration_statistics(dist, weight, sigma_multiplier, widen_first, is_first, ps):
    """Distance statistics + 3-sigma inlier mask for one iteration.

    Mirrors icpengine.cpp:234-278: population mean/σ over *all* pairs,
    threshold = mean + 3σ (first gui iteration: mean + max(3σ, 0.5·mean)),
    RMSE over inliers only.

    ``weight`` is a 0/1 row-validity vector (padding rows excluded — the
    sharded path pads the source to a device multiple) and ``ps`` is the
    cross-device reducer: identity on one device, ``psum`` over the mesh
    axis in the sharded path, so every moment here is a global moment.
    """
    f = dist.dtype
    n = ps(jnp.sum(weight))
    mean = ps(jnp.sum(dist * weight)) / n
    var = ps(jnp.sum(weight * (dist - mean) ** 2)) / n
    std = jnp.sqrt(var)

    widened = mean + jnp.maximum(sigma_multiplier * std, mean * 0.5)
    plain = mean + sigma_multiplier * std
    threshold = jnp.where(jnp.logical_and(widen_first, is_first), widened, plain)

    valid = jnp.logical_and(dist <= threshold, weight > 0)
    valid_count = ps(jnp.sum(valid, dtype=jnp.int32))
    sum_sq = ps(jnp.sum(jnp.where(valid, dist * dist, 0.0)))
    rmse = jnp.where(
        valid_count > 0,
        jnp.sqrt(sum_sq / jnp.maximum(valid_count, 1).astype(f)),
        jnp.asarray(0.0, f),
    )
    return mean, std, threshold, valid, valid_count, rmse, n


def _global_masked_median(dist, weight, ps):
    """Exact lower median of ``dist`` over weight>0 rows, identical on
    every shard: bisection on the float bit pattern (monotone for
    non-negative floats), one psum-reduced count per round.

    Replaces the psum-*averaged per-shard medians* of rounds 2-3
    (verdict W4): the dp layout makes shards spatially compact, so
    per-shard distance distributions genuinely differ and the average
    was an uncontrolled approximation — contamination concentrated in
    one shard's x-range skewed the M-estimator scale. This form returns
    the exact global order statistic ``sorted(valid)[(cnt-1)//2]``
    bit-for-bit (the bisection converges on the bit pattern of that very
    element), so the sharded robust trajectory equals the single-device
    one by construction. Wire cost: 31 scalar psums (f32; 63 for f64) —
    O(100 B)/iteration, inside the collective-payload invariant. Local
    cost is 31 masked-count passes, cheaper than the 1M-row lax.sort it
    replaces on the single-device path too.
    """
    valid = weight > 0
    cnt = ps(jnp.sum(valid, dtype=jnp.int32))
    k = jnp.maximum(cnt - 1, 0) // 2
    return _global_masked_kth(dist, valid, k, ps)


def _global_masked_kth(values, valid, k, ps):
    """Exact k-th smallest (0-based) of ``values`` over ``valid`` rows,
    identical on every shard — the bisection primitive behind
    ``_global_masked_median`` (values must be non-negative; the float
    bit pattern is then monotone)."""
    if values.dtype == jnp.float64:
        ibits = jax.lax.bitcast_convert_type(values, jnp.int64)
        nbits, itype = 63, jnp.int64
    else:
        ibits = jax.lax.bitcast_convert_type(
            values.astype(jnp.float32), jnp.int32
        )
        nbits, itype = 31, jnp.int32

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        c = ps(jnp.sum((valid & (ibits <= mid)).astype(jnp.int32)))
        take = c >= k + 1
        return (jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi))

    lo, _ = jax.lax.fori_loop(
        0, nbits, body,
        (jnp.zeros((), itype), jnp.asarray(2 ** nbits - 1, itype)),
    )
    med = jax.lax.bitcast_convert_type(
        lo, jnp.float32 if itype == jnp.int32 else jnp.float64
    )
    return med.astype(values.dtype)


def _plane_global(src, dst, nrm, valid, ps):
    """Point-to-plane update: minimize Σ v·((R·s + t − d)·n)² linearized
    about the identity (R·s ≈ s + ω×s), solved as 6×6 normal equations
    with cross-device psum — then lifted back to SE(3) via the exact
    exponential map.

    This estimator is an opt-in EXTENSION beyond the reference (which is
    point-to-point Kabsch only): on smooth scan surfaces the point-to-point
    update slides, while this one converges in a handful of iterations.
    """
    f = src.dtype
    hi = jax.lax.Precision.HIGHEST
    v = valid.astype(f)
    r0 = jnp.sum((src - dst) * nrm, axis=1)            # (N,)
    J = jnp.concatenate([nrm, jnp.cross(src, nrm)], axis=1)  # (N, 6)
    Jv = J * v[:, None]
    H6 = ps(jnp.dot(Jv.T, J, precision=hi))            # (6, 6)
    g = ps(jnp.dot(Jv.T, r0, precision=hi))            # (6,)
    lam = 1e-6 * jnp.trace(H6) / 6.0 + 1e-12
    delta = jnp.linalg.solve(
        H6 + lam * jnp.eye(6, dtype=H6.dtype), -g
    )
    return se3_exp(delta).astype(f)


def _kabsch_global(src, dst, valid, ps):
    """Two-pass masked Kabsch with cross-device moment reduction.

    Identical math to ops.kabsch.kabsch_masked, but the centroid sums and
    the 3×3 cross-covariance go through ``ps`` (psum over the mesh) — the
    TPU-native form of the reduction at icpengine.cpp:82-90.
    """
    f = src.dtype
    hi = jax.lax.Precision.HIGHEST
    v = valid.astype(f)
    cnt = ps(jnp.sum(v))
    inv = jnp.where(cnt > 0, 1.0 / cnt, 0.0)
    c_s = ps(jnp.dot(v, src, precision=hi)) * inv
    c_d = ps(jnp.dot(v, dst, precision=hi)) * inv
    Hm = ps(jnp.dot(((src - c_s) * v[:, None]).T, dst - c_d, precision=hi))
    return rigid_from_covariance(Hm, c_s, c_d).astype(f)


def highest_matmul_precision(fn):
    """Trace ``fn`` under full-f32 matmul precision.

    TPU matmuls with f32 inputs default to bf16 MXU passes; for geometry
    even the tiny ones matter — an unannotated 4×4 ``T @ T_cum`` pose
    composition injects ~1e-3 rotation error per ICP iteration, which
    stalls convergence (diagnosed against the f64/CPU trajectory). Every
    trace entry point of the framework wraps itself with this.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


@highest_matmul_precision
def icp_core_impl(
    source: jnp.ndarray,
    weight: jnp.ndarray,
    target: jnp.ndarray,
    nn_state,
    *,
    nn_fn: Callable,
    max_iterations: int,
    tolerance,
    sigma_multiplier,
    widen_first: bool,
    axis_name: Optional[str] = None,
    estimator: str = "point",
    robust: str = "none",
    carry: Optional[tuple] = None,
):
    """The ICP loop in the centered local frame. Returns a dict.

    ``robust`` ("none" | "huber" | "tukey") is an opt-in EXTENSION beyond
    the reference: it reweights the POSE UPDATE by an M-estimator
    influence function of the residual distance (scale = the iteration's
    σ), downweighting heavy-tailed correspondences the hard 3σ gate keeps.
    Statistics, RMSE, convergence, and history stay on the reference's
    binary inlier mask, so "none" is bit-identical to the reference
    semantics and robust modes share its convergence bookkeeping.

    Shared by the single-device jit path (``axis_name=None``) and the
    shard_map data-parallel path (``axis_name='dp'`` — source/weight are
    per-device shards; every statistic is psum-reduced so all devices step
    through identical convergence decisions and history records).

    ``carry`` = (T_cum, prev_error, no_improve) resumes the convergence
    state machine mid-run: segmented execution (session cooperative stop /
    live progress, runtime/session.py) and checkpoint resume dispatch the
    same compiled loop in slices whose concatenated trajectory is
    bit-identical to a single long dispatch.
    """
    f = source.dtype
    H = max_iterations

    if axis_name is None:
        ps = lambda x: x
    else:
        ps = lambda x: jax.lax.psum(x, axis_name)

    if carry is None:
        c_T = jnp.eye(4, dtype=f)
        c_prev = jnp.asarray(1e10, f)
        c_noimp = jnp.asarray(0, jnp.int32)
    else:
        c_T, c_prev, c_noimp = carry
        c_T = c_T.astype(f)
        c_prev = c_prev.astype(f)
        c_noimp = c_noimp.astype(jnp.int32)

    state = {
        "T_cum": c_T,
        "prev_error": c_prev,
        "no_improve": c_noimp,
        "iter": jnp.asarray(0, jnp.int32),
        "stop": jnp.asarray(RUNNING, jnp.int32),
        "recorded": jnp.asarray(0, jnp.int32),
        "h_rmse": jnp.zeros((H,), f),
        "h_valid": jnp.zeros((H,), jnp.int32),
        "h_out": jnp.zeros((H,), jnp.int32),
        "h_T": jnp.zeros((H, 4, 4), f),
        "h_mean": jnp.zeros((H,), f),
        "h_std": jnp.zeros((H,), f),
        "h_thr": jnp.zeros((H,), f),
    }

    tol = jnp.asarray(tolerance, f)
    sig = jnp.asarray(sigma_multiplier, f)

    def cond(s):
        return jnp.logical_and(s["iter"] < H, s["stop"] == RUNNING)

    def body(s):
        it = s["iter"]
        # Composed apply: current source from the pristine source and the
        # cumulative transform (see module docstring — this is what makes
        # segmented dispatch / checkpoint resume bit-identical). The
        # identity apply (iteration 0, no carry) is rounding-exact.
        src = apply_transform(s["T_cum"], source)

        # nn_fn contract: (query, target, state) -> (matched_points, dist)
        # — plus the matched normals for the point-to-plane estimator.
        # Returning coordinates (not indices) lets kernel backends skip an
        # N-row gather (~30 ns/row on TPU) — the pose update only ever
        # needs the matched coordinates (and normals).
        if estimator == "plane":
            dst_matched, dist, nrm = nn_fn(src, target, nn_state)
        else:
            dst_matched, dist = nn_fn(src, target, nn_state)

        mean, std, threshold, valid, valid_count, rmse, n_real = (
            iteration_statistics(dist, weight, sig, widen_first, it == 0, ps)
        )

        # Non-finite guard (sanitizer analog, SURVEY §5): NaN coordinates
        # poison every comparison below (NaN compares false → the loop
        # would run to max_iterations recording garbage). The reference
        # logs NaN/Inf distances (icpengine.cpp:208-218); here they stop
        # the run with an explicit reason and no corrupted record.
        numerr = ~jnp.isfinite(rmse + mean + std)

        # Convergence / divergence / degeneracy — checked before the pose
        # update, in the reference's order (icpengine.cpp:286-323).
        improvement = s["prev_error"] - rmse
        small = jnp.abs(improvement) < tol
        no_improve = jnp.where(small, s["no_improve"] + 1, 0)
        converged = jnp.logical_and(small, no_improve >= 3)
        converged = jnp.logical_and(converged, ~numerr)
        diverged = jnp.logical_and(~converged, rmse > s["prev_error"] * 1.1)
        too_few = jnp.logical_and(
            jnp.logical_and(~converged, ~diverged), valid_count < 3
        )
        will_update = ~(converged | diverged | too_few | numerr)

        # Masked pose update — always evaluated (fixed cost), selected below.
        # Robust modes soften the binary mask into M-estimator weights
        # (pose update only; statistics above stay reference-exact). The
        # scale is MEDIAN-based (σ̂ = med(d)/0.6745): the plain σ is
        # inflated by the very contamination being downweighted (measured:
        # σ-scaled Tukey only halves a 20%-biased pull; median-scaled
        # rejects it). The median is the exact GLOBAL order statistic on
        # every path — single-device, shard_map dp, and partitioned all
        # run the same bit-pattern bisection through ``ps``
        # (_global_masked_median), so the sharded robust trajectory is
        # bit-identical to the single-device one (round-3 verdict W4).
        if robust == "none":
            upd_w = valid
        else:
            scale = _global_masked_median(dist, weight, ps) / 0.6745
            if robust == "huber":
                c = 1.345 * scale
                w = jnp.minimum(1.0, c / jnp.maximum(dist, 1e-30))
            elif robust == "tukey":
                c = 4.685 * scale
                u = jnp.clip(dist / jnp.maximum(c, 1e-30), 0.0, 1.0)
                w = (1.0 - u * u) ** 2
            else:
                raise ValueError(f"unknown robust mode {robust!r}")
            # scale = 0 (already perfectly aligned) would zero every
            # weight; fall back to the plain mask there.
            w = jnp.where(scale > 0, w, 1.0)
            upd_w = valid.astype(f) * w.astype(f)
        if estimator == "plane":
            # Point-to-plane is a linearization about the CURRENT pose;
            # the increment composes onto the cumulative transform.
            T_inc = _plane_global(src, dst_matched, nrm, upd_w, ps)
            T_cand = T_inc @ s["T_cum"]
        else:
            # Direct cumulative fit: Kabsch from the PRISTINE source to
            # the matched targets. Because src = T_cum·src0 rigidly, the
            # minimizer of |T'·src0 − dst|² is exactly T_inc·T_cum where
            # T_inc is the reference's incremental fit from (src, dst)
            # (substitute T' = S·T_cum — a bijection over rigid S). Same
            # math, but the f32 product CHAIN is gone: T_cum is re-fit
            # from data every iteration instead of accumulating ~50
            # rounded 4×4 products (which cost ~1e-4 m at UTM scale).
            T_cand = _kabsch_global(source, dst_matched, upd_w, ps)
        # Degenerate fits (SVD of a non-finite/rank-collapsed H) also stop.
        numerr = numerr | ~jnp.all(jnp.isfinite(T_cand))
        will_update = will_update & ~numerr
        T_cum_new = jnp.where(will_update, T_cand, s["T_cum"])

        # History write: converged records the *previous* cumulative
        # transform (quirk 5); diverged/too_few record nothing.
        record = jnp.logical_or(will_update, converged)
        rec_T = jnp.where(converged, s["T_cum"], T_cum_new)

        def wr(arr, val):
            return jnp.where(record, arr.at[it].set(val), arr)

        stop = jnp.where(
            numerr,
            NUMERICAL_ERROR,
            jnp.where(
                converged,
                CONVERGED,
                jnp.where(
                    diverged, DIVERGED,
                    jnp.where(too_few, TOO_FEW_VALID, RUNNING),
                ),
            ),
        ).astype(jnp.int32)

        return {
            "T_cum": T_cum_new,
            "prev_error": jnp.where(will_update, rmse, s["prev_error"]),
            "no_improve": no_improve,
            "iter": it + 1,
            "stop": stop,
            "recorded": s["recorded"] + record.astype(jnp.int32),
            "h_rmse": wr(s["h_rmse"], rmse),
            "h_valid": wr(s["h_valid"], valid_count),
            "h_out": wr(s["h_out"], n_real.astype(jnp.int32) - valid_count),
            "h_T": jnp.where(record, s["h_T"].at[it].set(rec_T), s["h_T"]),
            "h_mean": wr(s["h_mean"], mean),
            "h_std": wr(s["h_std"], std),
            "h_thr": wr(s["h_thr"], threshold),
        }

    s = jax.lax.while_loop(cond, body, state)
    stop = jnp.where(s["stop"] == RUNNING, MAX_ITERATIONS, s["stop"])
    # Final registered source (dead-code-eliminated by XLA when the caller
    # drops it, e.g. return_registered=False).
    src_final = apply_transform(s["T_cum"], source)
    return {**s, "src": src_final, "stop": stop}


@functools.partial(
    jax.jit,
    static_argnames=(
        "nn_fn", "max_iterations", "widen_first", "estimator", "robust",
    ),
)
def _icp_core(
    source: jnp.ndarray,
    target: jnp.ndarray,
    nn_state,
    carry=None,
    weight=None,
    *,
    nn_fn: Callable,
    max_iterations: int,
    tolerance,
    sigma_multiplier,
    widen_first: bool,
    estimator: str = "point",
    robust: str = "none",
):
    """Single-device compiled entry for icp_core_impl. ``weight`` marks
    real (1) vs layout-padding (0) rows; None means all-real."""
    if weight is None:
        weight = jnp.ones(source.shape[:1], source.dtype)
    return icp_core_impl(
        source,
        weight,
        target,
        nn_state,
        nn_fn=nn_fn,
        max_iterations=max_iterations,
        tolerance=tolerance,
        sigma_multiplier=sigma_multiplier,
        widen_first=widen_first,
        axis_name=None,
        estimator=estimator,
        robust=robust,
        carry=carry,
    )


def _brute_adapter(query, target, nn_state):
    del nn_state
    idx, dist = nn_bruteforce(query, target)
    return target[idx], dist


def _brute_plane_adapter(query, target, nn_state):
    """Brute NN + matched-normal gather (nn_state = target normals)."""
    idx, dist = nn_bruteforce(query, target)
    return target[idx], dist, nn_state[idx]


def _default_nn(
    nn_backend: str,
    source_local: np.ndarray,
    target_local: np.ndarray,
    dtype,
    grid_resolution,
    cell_capacity,
    estimator: str = "point",
    source_dev=None,
    target_dev=None,
    device_layout: bool = False,
):
    """Pick the NN kernel; returns (nn_fn, nn_state, rows | None,
    weight | None, resolution | None).

    'auto': brute force while the all-pairs work is small (it is exact and
    rides the MXU); cell-blocked grid beyond — O(N) per iteration vs
    O(N·M). ``rows`` is a host-side row layout the caller must apply to
    the source (Morton order for tile coherence; the pallas backend uses
    the x-group-aligned layout with replicated padding rows, whose
    ``weight`` vector is 0 on padding) — every statistic is weight-masked
    and permutation-invariant, so only the final cloud needs un-permuting.

    Backend matrix (README "NN backend matrix" is the user-facing copy):
    'auto'/'pallas'/'bruteforce' are production backends with the full
    contract (plane mode, partitioned twins). 'hashgrid' and 'cellblock'
    are TEST/REFERENCE backends — exact 1-NN, point mode only (plane
    raises ValueError below, pinned by tests/test_icp_pairwise.py), never
    selected by 'auto': hashgrid exercises the reference's
    octree-leaf-capacity knob, cellblock is the CPU-testable XLA
    formulation the Pallas kernels are validated against.
    """
    m = len(target_local)
    n = len(source_local)
    if nn_backend == "auto":
        # Brute force while the all-pairs matmul is cheap; the Pallas
        # slab-sweep kernel beyond (the XLA cellblock formulation is kept
        # as an explicit backend for CPU-testable reference behavior).
        nn_backend = "bruteforce" if n * m <= 2 ** 31 else "pallas"
    if estimator == "plane" and nn_backend not in ("bruteforce", "pallas"):
        raise ValueError(
            "estimator='plane' supports nn_backend 'bruteforce' or 'pallas'"
        )
    if nn_backend == "bruteforce":
        # On a real TPU in f32, brute force routes through the slab-sweep
        # kernel with a degenerate one-cell grid (exact, same tie order):
        # the XLA explicit-difference form materializes an HBM-bound
        # (n, m, 3) chunk tensor — profiled 4x slower on the coarse
        # multiscale level. CPU/f64 paths keep the XLA form (interpret
        # mode is slow; f64 brute is the oracle-parity reference).
        use_kernel = (
            jax.default_backend() == "tpu"
            and m <= 131072
            and jnp.dtype(dtype) == jnp.float32
        )
        if estimator == "plane":
            from iterativeclosestpoint_tpu.ops.cellblock import (
                auto_resolution_data,
            )
            from iterativeclosestpoint_tpu.ops.normals import (
                estimate_normals_cellpca,
            )

            nrm = estimate_normals_cellpca(
                target_local, auto_resolution_data(target_local)
            )
            if use_kernel:
                from iterativeclosestpoint_tpu.ops.pallas_nn import (
                    make_pallas_brute,
                )

                fn, grid = make_pallas_brute(target_local, normals=nrm)
                return fn, grid, None, None, None
            return (_brute_plane_adapter, jnp.asarray(nrm, dtype), None,
                    None, None)
        if use_kernel:
            from iterativeclosestpoint_tpu.ops.pallas_nn import (
                make_pallas_brute,
            )

            fn, grid = make_pallas_brute(target_local)
            return fn, grid, None, None, None
        return _brute_adapter, (), None, None, None
    if nn_backend == "cellblock":
        from iterativeclosestpoint_tpu.ops.cellblock import (
            make_cellblock_nn,
            morton_order,
        )

        nn_fn, grid, resolution = make_cellblock_nn(
            target_local,
            resolution=(grid_resolution if grid_resolution else None),
            dtype=dtype,
        )
        perm = morton_order(source_local, resolution)
        return nn_fn, grid, perm, None, resolution
    if nn_backend == "hashgrid":
        from iterativeclosestpoint_tpu.ops.hashgrid import make_hashgrid_nn

        fn, grid = make_hashgrid_nn(
            target_local, resolution=grid_resolution or 64,
            capacity=cell_capacity, dtype=dtype,
        )
        return fn, grid, None, None, grid_resolution or 64
    if nn_backend == "pallas":
        from iterativeclosestpoint_tpu.ops.pallas_nn import (
            grouped_tile_order,
            grouped_tile_order_device,
            make_pallas_nn,
            make_pallas_nn_device,
        )

        if device_layout:
            # Grids + query layout (and, for plane mode, cell-PCA
            # normals) built on-accelerator.
            nn_fn, grid, resolution = make_pallas_nn_device(
                target_local, resolution=grid_resolution,
                target_dev=target_dev,
                with_normals=(estimator == "plane"),
            )
            if source_dev is None:
                source_dev = jnp.asarray(source_local, dtype)
            rows, weight = grouped_tile_order_device(
                source_dev, grid[0].origin, grid[0].cell_size,
                resolution=resolution,
                tile_q=getattr(nn_fn, "tile_q", 128),
                group=getattr(nn_fn, "layout_group", "x"),
            )
            return nn_fn, grid, rows, weight, resolution
        nn_fn, grid, resolution = make_pallas_nn(
            target_local, resolution=grid_resolution, dtype=dtype,
            with_normals=(estimator == "plane"),
        )
        rows, weight = grouped_tile_order(
            source_local, grid[0], resolution
        )
        return nn_fn, grid, rows, weight, resolution
    raise ValueError(f"unknown nn_backend {nn_backend!r}")


def _rebase_transform(T_local: np.ndarray, offset: np.ndarray) -> np.ndarray:
    """T_world = Shift(offset) @ T_local @ Shift(-offset)."""
    T = np.asarray(T_local, np.float64).copy()
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    T[..., :3, 3] = t + offset - (R @ offset)
    return T


_HIST_KEYS = ("h_rmse", "h_valid", "h_out", "h_T", "h_mean", "h_std", "h_thr")


def _run_segmented(
    dispatch,
    offset,
    f,
    *,
    max_iterations,
    segment_iterations,
    widen_first,
    progress_callback,
    stop_event,
    carry_init=None,
    segment_callback=None,
):
    """Dispatch a compiled ICP core in slices of ``segment_iterations``,
    carrying (T_cum, prev_error, no_improve) across dispatches.

    ``dispatch(carry, seg_n, widen_first)`` runs the compiled loop for
    ``seg_n`` iterations from ``carry`` and returns the core output dict —
    the single-device and shard_map paths plug in their own closures. The
    pristine source lives inside the closure and is passed to EVERY
    segment unchanged; the loop body recomputes the current source from
    the carried T_cum (composed apply), so the concatenated trajectory is
    bit-identical to one long dispatch. Between segments the host can emit
    live per-iteration records (the reference's ``iterationCompleted``
    signal, icpengine.cpp:366-367) and honor a cooperative stop flag (the
    reference checks ``m_shouldStop`` once per iteration,
    icpengine.cpp:160-164 — segment size is our stop granularity).
    """
    carry = carry_init if carry_init is not None else (
        jnp.eye(4, dtype=f),
        jnp.asarray(1e10, f),
        jnp.asarray(0, jnp.int32),
    )
    parts = {k: [] for k in _HIST_KEYS}
    total_recorded = 0
    done = 0
    stop = MAX_ITERATIONS
    out = None
    while done < max_iterations:
        seg_n = min(segment_iterations, max_iterations - done)
        out = dispatch(carry, seg_n, widen_first and done == 0)
        # One batched async pull for everything the host reads this
        # segment (vs ~9 sequential ~35 ms device-tunnel roundtrips).
        host = jax.device_get(
            {**{key: out[key] for key in _HIST_KEYS},
             "recorded": out["recorded"], "stop": out["stop"],
             "T_cum": out["T_cum"], "prev_error": out["prev_error"],
             "no_improve": out["no_improve"]}
        )
        k = int(host["recorded"])
        for key in _HIST_KEYS:
            parts[key].append(host[key][:k])
        carry = (out["T_cum"], out["prev_error"], out["no_improve"])
        seg_stop = int(host["stop"])

        if progress_callback is not None:
            seg_T_world = _rebase_transform(host["h_T"][:k], offset)
            for i in range(k):
                Tw = seg_T_world[i]
                rot = float(np.degrees(np.arccos(np.clip(
                    (np.trace(Tw[:3, :3]) - 1) / 2, -1, 1))))
                progress_callback(
                    {
                        "iteration": total_recorded + i + 1,
                        "rmse": float(host["h_rmse"][i]),
                        "valid_points": int(host["h_valid"][i]),
                        "outlier_points": int(host["h_out"][i]),
                        "transform": Tw,
                        "rotation_angle_deg": rot,
                        "translation_norm": float(np.linalg.norm(Tw[:3, 3])),
                        "mean_dist": float(host["h_mean"][i]),
                        "std_dist": float(host["h_std"][i]),
                        "threshold": float(host["h_thr"][i]),
                    }
                )
        total_recorded += k
        done += seg_n
        if segment_callback is not None:
            # Segment-boundary resumable state: the exact loop carry (the
            # reference's prev_error/no_improvement_count locals,
            # icpengine.cpp:156-157) in world frame — feeding it back via
            # ``resume_carry`` continues bit-identically.
            segment_callback(
                {
                    "iteration": total_recorded,
                    "transform": _rebase_transform(host["T_cum"], offset),
                    # Local-frame carry: the world rebase round-trips
                    # through catastrophic cancellation at UTM scale, so
                    # bit-identical resume re-enters through these.
                    "transform_local": np.asarray(host["T_cum"]),
                    "offset": np.asarray(offset, np.float64),
                    "prev_error": float(host["prev_error"]),
                    "no_improve": int(host["no_improve"]),
                }
            )
        if seg_stop != MAX_ITERATIONS:
            stop = seg_stop
            break
        if stop_event is not None and stop_event.is_set():
            stop = STOPPED
            break

    return {
        "src": out["src"],
        "T_cum": carry[0],
        "prev_error": carry[1],
        "no_improve": carry[2],
        "iter": np.asarray(done, np.int32),
        "stop": np.asarray(stop, np.int32),
        "recorded": np.asarray(total_recorded, np.int32),
        **{
            k: (
                np.concatenate(parts[k])
                if parts[k]
                else np.zeros((0,) + ((4, 4) if k == "h_T" else ()))
            )
            for k in _HIST_KEYS
        },
    }


def apply_permutation(
    res: ICPResult, rows: np.ndarray, weight: "np.ndarray | None" = None,
    n_orig: "int | None" = None,
) -> ICPResult:
    """Undo a query row layout on the per-point output (the registered
    cloud); all other fields are layout-invariant. ``rows`` may contain
    replicated padding rows (grouped tile layout) marked by weight 0."""
    if res.source_registered is not None:
        reg = res.source_registered
        if weight is None:
            unperm = np.empty_like(reg)
            unperm[rows] = reg
        else:
            real = weight > 0
            unperm = np.empty((n_orig or len(rows), reg.shape[1]), reg.dtype)
            unperm[rows[real]] = reg[real]
        res.source_registered = unperm
    return res


# Module-level jit: a per-call ``jax.jit`` object defeats the trace cache
# and recompiles through this environment's remote compile service on
# EVERY call (~9 s/run measured; SCALING.md partitioned-10M notes).
_apply_transform_jit = jax.jit(apply_transform)

_SCALAR_CACHE: dict = {}


def _dev_scalar_eye(dtype):
    """Device-resident 4×4 identity, cached per dtype (see _dev_scalar)."""
    key = ("eye4", jnp.dtype(dtype).name)
    v = _SCALAR_CACHE.get(key)
    if v is None:
        v = jnp.asarray(np.eye(4), dtype)
        _SCALAR_CACHE[key] = v
    return v


def _dev_scalar(value, dtype):
    """Device-resident scalar, cached per (value, dtype).

    The loop scalars (tolerance, sigma) are traced args (static would
    recompile per value) — but passing Python floats transfers a scalar
    host→device on EVERY dispatch, and through this environment's FIFO
    transfer queue a dispatch queued behind the multiscale pipeline's
    24 MB uploads waits for them (~0.5 s) before a 0.1 s coarse pass can
    even start. A cached device scalar makes the dispatch transfer-free.
    """
    key = (float(value), jnp.dtype(dtype).name)
    v = _SCALAR_CACHE.get(key)
    if v is None:
        v = jnp.asarray(value, dtype)
        _SCALAR_CACHE[key] = v
    return v


@functools.partial(jax.jit, static_argnames=("resolution", "tile_q",
                                              "group", "fold"))
def _prep_fine_source(src_raw, T_loc, origin, cell_size, *, resolution,
                      tile_q=128, group="x", fold=True):
    """One-dispatch fine-level source prep: apply the (local-frame) initial
    transform on device, build the x-group-aligned query layout, gather.

    Fusing these (vs three separate dispatches) matters on hosts where
    every dispatch round-trips a device tunnel (~30 ms each).

    ``fold=False``: the layout is still computed at the TRANSFORMED
    positions (tile coherence needs the current pose) but the returned
    rows are the RAW source reordered — for callers whose loop carry
    already contains the pose (the two-stage boosted fine level resumes
    through ``resume_carry``; folding it into the source too would
    apply it twice)."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        grouped_tile_order_device,
    )

    src = apply_transform(T_loc, src_raw)
    # with_coords fuses the row-ordered coordinate gather into the
    # layout's own output gather (one ~30 ns/row pass instead of two);
    # fold=False keys the layout by the transformed positions but
    # carries the RAW coordinates as the payload.
    rows, weight, src_rows = grouped_tile_order_device(
        src, origin, cell_size, resolution=resolution, tile_q=tile_q,
        group=group, with_coords=True,
        coords=None if fold else src_raw,
    )
    return src_rows, rows, weight


def icp_register(
    source,
    target,
    *,
    max_iterations: int = 50,
    tolerance: float = 1e-6,
    sigma_multiplier: float = 3.0,
    mode: str = "gui",
    nn_backend: str = "auto",
    nn_fn: Optional[Callable] = None,
    nn_state=(),
    grid_resolution: Optional[int] = None,
    cell_capacity: Optional[int] = None,
    estimator: str = "point",
    robust: str = "none",
    dtype=jnp.float32,
    center: bool = True,
    return_registered: bool = True,
    initial_transform: Optional[np.ndarray] = None,
    segment_iterations: int = 0,
    progress_callback: Optional[Callable] = None,
    stop_event=None,
    device_data=None,
    prepared_nn=None,
    resume_carry: Optional[tuple] = None,
    segment_callback: Optional[Callable] = None,
    layout_transform: Optional[np.ndarray] = None,
) -> ICPResult:
    """Register ``source`` onto ``target``; returns world-frame results.

    Host-side wrapper: applies the f64 global-offset centering, launches
    the compiled loop, and re-bases transforms to world frame
    (T_world = Shift(c) · T_local · Shift(-c)).

    ``initial_transform`` (4,4) pre-aligns the source (e.g. a coarse-level
    estimate, models/multiscale.py); the returned transforms include it.

    ``segment_iterations`` > 0 dispatches the loop in compiled slices of
    that many iterations (identical trajectory), enabling
    ``progress_callback`` (live per-iteration records — the reference's
    iterationCompleted signal) and ``stop_event`` (a threading.Event;
    cooperative stop with segment granularity — registrationservice
    stopRegistration equivalent).

    ``resume_carry`` = (T_world (4,4), prev_error, no_improve) — the
    convergence carry from a segment-boundary checkpoint
    (runtime/checkpoint.py). The loop starts from this exact state
    instead of identity/1e10/0, and because the body recomputes the
    source from the pristine source via the cumulative transform
    (composed apply), the continued trajectory is bit-identical to the
    uninterrupted run. First-iteration threshold widening is already
    spent, so it is disabled on resume. Mutually exclusive with
    ``initial_transform`` (which restarts the convergence machine).

    ``segment_callback`` (requires ``segment_iterations`` > 0) fires at
    every segment boundary with the resumable state
    {iteration, transform, prev_error, no_improve} — the checkpoint hook.

    ``device_data`` = (src_dev, tgt_dev, offset): pre-centered f32 device
    arrays (centered by ``offset``) whose uploads the caller started
    earlier — the multiscale pipeline overlaps them with its coarse pass.
    ``initial_transform`` is then applied on device (local frame) instead
    of on host, so the aligned source never re-rides the host↔device link.
    ``prepared_nn`` = (nn_fn, nn_state, resolution) from
    ops.pallas_nn.make_pallas_nn_device, built against ``tgt_dev``.
    """
    source = np.asarray(source, np.float64)
    target = np.asarray(target, np.float64)
    T_init = None
    if initial_transform is not None:
        if resume_carry is not None:
            raise ValueError(
                "initial_transform and resume_carry are mutually exclusive"
            )
        T_init = np.asarray(initial_transform, np.float64)
        if device_data is None:
            source = source @ T_init[:3, :3].T + T_init[:3, 3]

    if device_data is not None:
        offset = np.asarray(device_data[2], np.float64)
    else:
        offset = (
            hostmath.center_offset(target)
            if center
            else np.zeros(3)
        )
    if estimator not in ("point", "plane"):
        raise ValueError(f"unknown estimator {estimator!r}")
    if robust not in ("none", "huber", "tukey"):
        raise ValueError(f"unknown robust mode {robust!r}")
    n_orig = len(source)
    rows = row_weight = None
    nn_res = None  # resolved grid resolution (observability, W2)
    src_np = tgt_np = None  # host copies, computed lazily when needed
    if device_data is not None:
        src_local, tgt_local = device_data[0], device_data[1]
        src_local = src_local.astype(dtype)
        tgt_local = tgt_local.astype(dtype)
        if T_init is not None and prepared_nn is None:
            T_loc = _rebase_transform(T_init, -offset)
            src_local = _apply_transform_jit(
                jnp.asarray(T_loc, dtype), src_local
            )
    else:
        with stage("host_prep"):
            src_np = source - offset
            tgt_np = target - offset
        _isz = jnp.dtype(dtype).itemsize
        with stage(
            "upload",
            bytes=(len(src_np) + len(tgt_np)) * 3 * _isz,
        ) as done:
            src_local = jnp.asarray(src_np, dtype)
            tgt_local = jnp.asarray(tgt_np, dtype)
            done((src_local, tgt_local))
    layout_applied = False
    if nn_fn is None and prepared_nn is not None:
        nn_fn, nn_state, resolution = prepared_nn
        nn_res = resolution
        if getattr(nn_fn, "with_normals", False) != (estimator == "plane"):
            raise ValueError(
                "prepared_nn was built with with_normals="
                f"{getattr(nn_fn, 'with_normals', False)} but "
                f"estimator={estimator!r} — rebuild the factory to match"
            )
        grid0 = nn_state[0]
        fold = True
        if T_init is not None and device_data is not None:
            T_loc = _rebase_transform(T_init, -offset)
        elif layout_transform is not None and device_data is not None:
            # Layout-only pose (two-stage boosted fine, multiscale.py):
            # the carry already holds the full pose, so the layout is
            # computed at ``layout_transform`` but the source stays
            # raw — folding would apply the pose twice. Deliberately
            # NOT applied on the generic resume path: a resumed run's
            # layout must match the uninterrupted run's (row order
            # feeds reduction order — bit-identical resume).
            T_loc = _rebase_transform(
                np.asarray(layout_transform, np.float64), -offset
            )
            fold = False
        else:
            # Cached device identity: the only per-call host→device
            # transfer left on the prepared path — through the FIFO
            # transfer queue even a 64 B upload queued behind another
            # edge's staged bulk uploads stalls the prep dispatch
            # (multi-scan pipelining, round-4 W5).
            T_loc = _dev_scalar_eye(dtype)
        with stage("prep") as done:
            src_local, rows, row_weight = _prep_fine_source(
                src_local, jnp.asarray(T_loc, dtype), grid0.origin,
                grid0.cell_size, resolution=resolution,
                tile_q=getattr(nn_fn, "tile_q", 128),
                group=getattr(nn_fn, "layout_group", "x"),
                fold=fold,
            )
            done(src_local)
        layout_applied = True  # _prep_fine_source already gathered
    elif nn_fn is None:
        if src_np is None:
            with stage("host_prep"):
                src_np = source - offset
                tgt_np = target - offset
        with stage("nn_build") as done:
            nn_fn, nn_state, rows, row_weight, nn_res = _default_nn(
                nn_backend, src_np, tgt_np, dtype,
                grid_resolution, cell_capacity, estimator,
                source_dev=src_local, target_dev=tgt_local,
                device_layout=True,
            )
            done(nn_state)
    if rows is not None and not layout_applied:
        if isinstance(rows, jnp.ndarray):
            src_local = src_local[rows]  # device gather, device layout
        else:
            src_np = src_np[rows]
            src_local = jnp.asarray(src_np, dtype)
    weight_dev = (
        jnp.asarray(row_weight, dtype) if row_weight is not None else None
    )

    if T_init is not None:
        # The loop's T_cum is relative to the pre-aligned source; live
        # records must report the full world transform (the final
        # packaging composes T_init below — the callbacks must too).
        def _compose(cb):
            if cb is None:
                return None

            def wrapped(rec):
                # Drop the local-frame carry keys: they do not include
                # T_init, so a resume through them would lose it — the
                # (composed) world transform is the correct resume path.
                rec = {k: v for k, v in rec.items()
                       if k not in ("transform_local", "offset")}
                Tw = rec["transform"] @ T_init
                rec["transform"] = Tw
                # Rotation/translation magnitudes follow the COMPOSED
                # transform (the run-relative values would jump at a
                # stage/resume boundary — round-5 review finding on the
                # two-stage fine level).
                if "rotation_angle_deg" in rec:
                    rec["rotation_angle_deg"] = float(np.degrees(
                        np.arccos(np.clip(
                            (np.trace(Tw[:3, :3]) - 1) / 2, -1, 1))))
                    rec["translation_norm"] = float(
                        np.linalg.norm(Tw[:3, 3]))
                cb(rec)

            return wrapped

        progress_callback = _compose(progress_callback)
        segment_callback = _compose(segment_callback)

    carry = None
    widen = mode == "gui"
    if resume_carry is not None:
        if isinstance(resume_carry, dict):
            T_w = resume_carry["transform"]
            pe = resume_carry["prev_error"]
            ni = resume_carry["no_improve"]
            T_l = resume_carry.get("transform_local")
            ck_off = resume_carry.get("offset")
        else:
            T_w, pe, ni = resume_carry
            T_l = ck_off = None
        if (
            T_l is not None
            and ck_off is not None
            and np.array_equal(np.asarray(ck_off, np.float64), offset)
        ):
            # Same centering frame: re-enter through the exact local
            # matrix (bit-identical — the world rebase round-trips
            # through catastrophic cancellation at UTM scale).
            T_loc = np.asarray(T_l, np.float64)
        else:
            T_loc = _rebase_transform(np.asarray(T_w, np.float64), -offset)
        carry = (
            jnp.asarray(T_loc, dtype),
            jnp.asarray(pe, dtype),
            jnp.asarray(int(ni), jnp.int32),
        )
        widen = False  # the run's first iteration is long past

    if not segment_iterations and n_orig >= 2_000_000:
        # Auto-segment very large runs: a single fused while-loop program
        # over 10M points can run minutes on device when iterations go
        # repair-heavy (poorly aligned start), and device programs that
        # run longer than ~1-2 min get the worker killed (observed: 25 s
        # programs survive, ~260 s programs crash the TPU worker).
        # Slices of 2-4 iterations keep each dispatch bounded; the
        # trajectory is identical (same compiled body, carried state).
        segment_iterations = max(2, int(8_000_000 // max(n_orig, 1)))
    tol_dev = _dev_scalar(tolerance, dtype)
    sig_dev = _dev_scalar(sigma_multiplier, dtype)
    if segment_iterations and segment_iterations > 0:
        def dispatch(carry_, seg_n, widen_):
            return _icp_core(
                src_local, tgt_local, nn_state, carry_, weight_dev,
                nn_fn=nn_fn, max_iterations=seg_n, tolerance=tol_dev,
                sigma_multiplier=sig_dev, widen_first=widen_,
                estimator=estimator, robust=robust,
            )

        with stage("loop"):
            out = _run_segmented(
                dispatch, offset, src_local.dtype,
                max_iterations=max_iterations,
                segment_iterations=segment_iterations,
                widen_first=widen,
                progress_callback=progress_callback, stop_event=stop_event,
                carry_init=carry, segment_callback=segment_callback,
            )
    else:
        with stage("loop") as done:
            out = _icp_core(
                src_local,
                tgt_local,
                nn_state,
                carry,
                weight=weight_dev,
                nn_fn=nn_fn,
                max_iterations=max_iterations,
                tolerance=tol_dev,
                sigma_multiplier=sig_dev,
                widen_first=widen,
                estimator=estimator,
                robust=robust,
            )
            done(out["T_cum"])
    with stage("package"):
        res = package_result(out, offset, return_registered)
    res.nn_resolution = nn_res
    if rows is not None and res.source_registered is not None:
        res = apply_permutation(
            res, np.asarray(rows),
            np.asarray(row_weight) if row_weight is not None else None,
            n_orig,
        )
    if T_init is not None:
        res.transform = res.transform @ T_init
        res.history_transform = res.history_transform @ T_init
        # Rotation/translation histories follow the composed transforms
        # (run-relative values would be discontinuous against history
        # records from a later resumed/boosted stage, whose carry holds
        # the full pose). The reference computes these magnitudes from
        # its own cumulative transform (icpengine.cpp:361-362) — with a
        # pre-alignment folded in, the composed cumulative IS that
        # transform.
        trc = np.trace(res.history_transform[:, :3, :3], axis1=1, axis2=2)
        res.history_rotation_deg = np.degrees(
            np.arccos(np.clip((trc - 1) / 2, -1, 1))
        )
        res.history_translation = np.linalg.norm(
            res.history_transform[:, :3, 3], axis=1
        )
        # The local carry does not include T_init — a resume through it
        # would lose the pre-alignment; force the world-transform path.
        res.carry_transform_local = None
        res.center_offset = None
    return res


def package_result(out, offset, return_registered: bool = True) -> ICPResult:
    """Convert the device-side output dict of an ICP core into a
    world-frame ICPResult (shared by the single-device and sharded paths)."""
    if not return_registered:
        # Don't pull the (N,3) registered cloud through the device->host
        # tunnel when the caller only wants the transform/history (the
        # multiscale coarse levels and the bench do this every call).
        out = {k: v for k, v in out.items() if k != "src"}
    # device_get starts ALL transfers async then collects — one tunnel
    # roundtrip instead of ~13 sequential blocking np.asarray pulls
    # (~35 ms each through the device tunnel).
    out = jax.device_get(out)
    out = jax.tree.map(np.asarray, out)  # passthrough for np leaves

    k = int(out["recorded"])
    stop = int(out["stop"])
    success = stop not in (TOO_FEW_VALID, STOPPED, NUMERICAL_ERROR)

    def rebase(T_local: np.ndarray) -> np.ndarray:
        return _rebase_transform(T_local, offset)

    h_T_world = rebase(out["h_T"][:k])
    rot_deg = np.degrees(
        np.arccos(
            np.clip(
                (np.trace(h_T_world[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1
            )
        )
    ) if k else np.zeros((0,))
    t_norm = (
        np.linalg.norm(h_T_world[:, :3, 3], axis=1) if k else np.zeros((0,))
    )

    return ICPResult(
        success=success,
        message=_STOP_MESSAGES.get(stop, "unknown"),
        transform=rebase(out["T_cum"]),
        rmse=float(out["h_rmse"][k - 1]) if k else 0.0,
        iterations=k,
        stop_reason=stop,
        history_rmse=out["h_rmse"][:k],
        history_valid=out["h_valid"][:k],
        history_outliers=out["h_out"][:k],
        history_transform=h_T_world,
        history_rotation_deg=rot_deg,
        history_translation=t_norm,
        history_mean_dist=out["h_mean"][:k],
        history_std_dist=out["h_std"][:k],
        history_threshold=out["h_thr"][:k],
        source_registered=(
            np.asarray(out["src"], np.float64) + offset
            if return_registered
            else None
        ),
        carry_prev_error=float(out["prev_error"]),
        carry_no_improve=int(out["no_improve"]),
        carry_transform_local=np.asarray(out["T_cum"]),
        center_offset=np.asarray(offset, np.float64),
    )
