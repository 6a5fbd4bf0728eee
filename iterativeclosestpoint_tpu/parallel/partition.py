"""Spatially partitioned target: each device owns an x-slab + halo.

The replicated-target data-parallel path (parallel/sharded.py) caps out
when the target no longer fits per-device HBM. This module implements the
SURVEY.md §5/§7 design: the target is partitioned into x-range slabs by
point-count quantiles (balanced), each device holding its slab plus a
halo of width h; x-sorted source shards are spatially compact, so almost
every query's neighborhood is local.

Exactness per query is certified by a *margin* argument: if the best
local distance d satisfies d < distance(query, halo x-limits), the true
nearest neighbor's x lies strictly inside this device's halo range, so it
was in the searched set — no slab-membership bookkeeping needed, and the
certificate survives source drift across iterations. Uncertified queries
(budgeted per device, multiple passes) are repaired collectively: one
``all_gather`` broadcasts them, every device searches its own slab, and a
``pmin``/``psum`` combine selects the global winner — the halo-exchange
analog of ring-attention's KV pass (SURVEY.md §5).

Tie exactness (reference semantics: first minimal index in target order,
core/octree.cpp best-first scan order): every slab row carries its
ORIGINAL target index; the collective combine breaks distance ties by a
second ``pmin`` over the winners' original indices, so equidistant
candidates held by different devices resolve to the globally-first target
point — never an average of two points. Within a device the strict (<)
margin plus the slab's original-order sort make the local first-tie the
global one.

Per-device local search backends (``local_search``):
  * ``"brute"`` — exact XLA brute force over the slab (MXU-friendly at
    small slab sizes; the CPU-testable reference behavior).
  * ``"pallas"`` — the slab-sweep grid kernel (ops/pallas_nn.py) over a
    per-device grid built ON DEVICE from the sharded slab buffer
    (``_build_grid_dev(mask_far=True)``) — no per-slab host sorts or grid
    uploads. Kernel-uncertified or tied queries join the margin-failed
    ones in the collective repair, so the exactness contract is identical.
  * ``"auto"`` — pallas on TPU for slabs too large to brute-force,
    brute otherwise.

Scales the reference's single-tree design (icp_registration.cpp:443-622
semantics) to targets beyond per-chip HBM.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.utils import hostmath
from jax.sharding import Mesh, PartitionSpec as P

from iterativeclosestpoint_tpu.models.icp import (
    ICPResult,
    _rebase_transform,
    _run_segmented,
    icp_core_impl,
    package_result,
)
from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
from iterativeclosestpoint_tpu.ops.cellblock import auto_resolution_data
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh, pad_to_multiple

_FAR = 1.0e6
_IMAX = np.int32(2**31 - 1)


def _coarse_params(resolution: int, coarse_trange: int = 0) -> tuple[int, int]:
    """Coarse repair-grid params shared by prep and the NN closure.
    ``coarse_trange`` 0 = the historical fixed floor; the entry computes
    a data-adaptive value from the slab slices (a fixed budget overflows
    on dense slabs and silently disables the cheap repair tier)."""
    return max(resolution // 4, 8), coarse_trange or 16384


class PartitionState(NamedTuple):
    halo_pts: jnp.ndarray   # (D, M_loc, 3) per-device slab+halo (far-padded)
    halo_idx: jnp.ndarray   # (D, M_loc) original target index (pad: INT_MAX)
    halo_nrm: jnp.ndarray   # (D, M_loc, 3) per-point normals (zeros unless
                            # plane mode)
    x_lo: jnp.ndarray       # (D,) halo lower x-limit per device
    x_hi: jnp.ndarray       # (D,) halo upper x-limit per device


def _slab_selection(target: np.ndarray, n_dev: int, halo: float):
    """Host-side slab row selection: x-quantile walls ± halo (x only —
    cheap even at 10M+ rows)."""
    qs = np.quantile(target[:, 0], np.linspace(0, 1, n_dev + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    sels = []
    los = np.empty(n_dev)
    his = np.empty(n_dev)
    for d in range(n_dev):
        lo = qs[d] - halo
        hi = qs[d + 1] + halo
        sel = np.nonzero((target[:, 0] >= lo) & (target[:, 0] < hi))[0]
        sels.append(sel)
        los[d] = lo
        his[d] = hi
    return sels, los, his


def build_partition(
    target: np.ndarray, n_dev: int, halo: float, dtype=np.float32,
    normals: "np.ndarray | None" = None,
) -> PartitionState:
    """Host-side: x-quantile slabs + halo, padded to a common size."""
    target = np.asarray(target)
    sels, los, his = _slab_selection(target, n_dev, halo)
    m_loc = max(len(s) for s in sels)
    m_loc = -(-m_loc // 128) * 128
    buf = np.full((n_dev, m_loc, 3), _FAR, dtype)
    idx = np.full((n_dev, m_loc), _IMAX, np.int32)
    nrm = np.zeros((n_dev, m_loc, 3), dtype)
    for d, s in enumerate(sels):
        buf[d, : len(s)] = target[s]
        idx[d, : len(s)] = s.astype(np.int32)
        if normals is not None:
            nrm[d, : len(s)] = normals[s]
    return PartitionState(
        halo_pts=jnp.asarray(buf),
        halo_idx=jnp.asarray(idx),
        halo_nrm=jnp.asarray(nrm),
        x_lo=jnp.asarray(los, dtype),
        x_hi=jnp.asarray(his, dtype),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "with_normals"))
def _gather_slabs(tgt, nrm, idx, *, mesh: Mesh, with_normals: bool):
    """Module-level jit (cache survives across registrations — a
    per-call jax.jit object recompiles through this environment's remote
    compile service on EVERY run, ~9 s at 10M)."""

    def g(tgt_, nrm_, idx_):
        n = tgt_.shape[0]
        i = idx_[0]
        tp = jnp.concatenate(
            [tgt_, jnp.full((1, 3), _FAR, jnp.float32)], axis=0
        )
        hp = tp[i][None]
        hi = jnp.where(i < n, i, _IMAX)[None]
        if not with_normals:
            hn = jnp.zeros((1, idx_.shape[1], 3), jnp.float32)
            return hp, hn, hi
        npad = jnp.concatenate(
            [nrm_, jnp.zeros((1, 3), jnp.float32)], axis=0
        )
        return hp, npad[i][None], hi

    return jax.shard_map(
        g, mesh=mesh, in_specs=(P(), P(), P("dp")), out_specs=P("dp"),
        check_vma=False,
    )(tgt, nrm, idx)


def build_partition_device(
    target: np.ndarray, n_dev: int, halo: float, mesh: Mesh,
    with_normals: bool = False, sels=None, los=None, his=None,
    target_dev=None,
) -> PartitionState:
    """Device-side slab assembly: upload the target ONCE, gather slabs
    (and plane normals) on device.

    The host variant uploads (D, M_loc) slab copies + normals and — in
    plane mode — round-trips the device-built normals through the host:
    ~5× the target's bytes over the host↔device link (at 10M points
    behind this environment's 58 MB/s tunnel, ~10 s per registration).
    Here the host ships the (N,3) f32 target plus one (D, M_loc) int32
    row-index table; the slab buffers, original-index table, and cell-PCA
    normals (estimate_normals_cellpca_device) are produced by gathers
    inside a shard_map. f32-only (the TPU path). Note the full target is
    transiently materialized per device during the gather — for targets
    so large that this breaks per-chip HBM, use the host build.
    """
    target = np.asarray(target)
    n = len(target)
    if sels is None:
        sels, los, his = _slab_selection(target, n_dev, halo)
    m_loc = max(len(s) for s in sels)
    m_loc = -(-m_loc // 128) * 128
    # Sentinel n points one past the real rows → the appended pad row.
    idx = np.full((n_dev, m_loc), n, np.int32)
    for d, s in enumerate(sels):
        idx[d, : len(s)] = s.astype(np.int32)

    if target_dev is None:
        target_dev = jnp.asarray(target.astype(np.float32))
    tgt_dev = target_dev
    idx_dev = jnp.asarray(idx)
    if with_normals:
        from iterativeclosestpoint_tpu.ops.normals import (
            estimate_normals_cellpca_device,
        )

        r0 = auto_resolution_data(target)
        tmin = target.min(axis=0)
        ext0 = float((target.max(axis=0) - tmin).max()) or 1.0
        nrm_dev = estimate_normals_cellpca_device(
            tgt_dev,
            jnp.asarray(tmin, jnp.float32),
            jnp.asarray(max(ext0 / r0, 1e-9), jnp.float32),
            resolution=r0,
        )
    else:
        nrm_dev = None

    if nrm_dev is None:  # unused placeholder keeps one shard_map shape
        nrm_dev = jnp.zeros((1, 3), jnp.float32)
    halo_pts, halo_nrm, halo_idx = _gather_slabs(
        tgt_dev, nrm_dev, idx_dev, mesh=mesh, with_normals=with_normals,
    )
    return PartitionState(
        halo_pts=halo_pts,
        halo_idx=halo_idx,
        halo_nrm=halo_nrm,
        x_lo=jnp.asarray(los, jnp.float32),
        x_hi=jnp.asarray(his, jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "resolution", "trange", "tile_q", "with_normals",
        "fine_kernel", "coarse_trange",
    ),
)
def _prepare_partitioned(
    source, weight, part: PartitionState, *, mesh: Mesh, resolution: int,
    trange: int, tile_q: int, with_normals: bool, fine_kernel: str = "sweep",
    coarse_trange: int = 0,
):
    """One-time per-run prep: per-device slab grids (fine + coarse) and
    the group-aligned source layout, built ON DEVICE under shard_map.

    All of it is pose-invariant (the target never moves; the query layout
    is pose-robust — ops/pallas_nn.grouped_tile_order), so under segmented
    dispatch (the ≥2M watchdog guard) hoisting it here removes two
    M_loc-row stable sorts + an N_loc-row sort from EVERY segment — the
    bulk of the measured 10× partitioned-vs-single fine-loop gap at 10M.

    ``fine_kernel``: "sweep" (x-slab sweep grid + x-group layout — scan
    surfaces) or "zcol" (z-window column grid with anisotropic per-axis
    cells + (x,y)-group layout — the volume regime; ``trange`` is then
    the z-window row budget). The coarse repair grid is the x-sweep form
    in both regimes, mirroring ops.pallas_nn.make_pallas_nn_device.
    """
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        _build_grid_dev,
        _build_zgrid_dev,
        grouped_tile_order_device,
    )

    coarse_resolution, coarse_trange = _coarse_params(
        resolution, coarse_trange
    )

    def prep(src, w, halo, nrm):
        halo0 = halo[0]
        nrm0 = nrm[0] if with_normals else None
        # Per-device grid geometry from the slab's own (dynamic) bbox;
        # _FAR padding rows sort past the last cell (mask_far).
        real = halo0[:, 0] < _FAR * 0.5
        big = jnp.asarray(_FAR, jnp.float32)
        lo3 = jnp.min(jnp.where(real[:, None], halo0, big), axis=0)
        hi3 = jnp.max(jnp.where(real[:, None], halo0, -big), axis=0)
        if fine_kernel == "zcol":
            # Anisotropic cells: per-axis extent/R (cubic cells starve an
            # x-thin slab of x resolution and a flat box of z resolution).
            cell = jnp.maximum((hi3 - lo3) / resolution, 1e-9)
            grid = _build_zgrid_dev(
                halo0, lo3, cell, resolution=resolution, zrange=trange,
                normals=nrm0, mask_far=True,
            )
        else:
            cell = jnp.maximum(jnp.max(hi3 - lo3) / resolution, 1e-9)
            grid = _build_grid_dev(
                halo0, lo3, cell, resolution=resolution, trange=trange,
                normals=nrm0, mask_far=True,
            )
        cell_c = jnp.maximum(jnp.max(hi3 - lo3) / coarse_resolution, 1e-9)
        cgrid = _build_grid_dev(
            halo0, lo3, cell_c, resolution=coarse_resolution,
            trange=coarse_trange, normals=nrm0, mask_far=True,
        )
        rows, lw = grouped_tile_order_device(
            src, lo3, cell, resolution=resolution, tile_q=tile_q,
            group="xy" if fine_kernel == "zcol" else "x",
        )
        expand = lambda g: jax.tree.map(lambda x: x[None], g)
        return src[rows], w[rows] * lw, expand(grid), expand(cgrid)

    return jax.shard_map(
        prep, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )(source, weight, part.halo_pts, part.halo_nrm)


@functools.partial(jax.jit, static_argnames=("mesh", "resolution"))
def fill_partition_normals(
    part: PartitionState, *, mesh: Mesh, resolution: int = 64
) -> PartitionState:
    """Per-slab device cell-PCA normals for an ingest-built
    PartitionState (plane mode — halo_nrm arrives as zeros from
    parallel.ingest.load_las_partitioned_target).

    Each device estimates normals from ITS OWN slab buffer (slab + halo
    covers every real point's neighborhood within the halo width), on a
    per-slab grid from the slab's own bbox — a different grid than the
    full-cloud estimate the non-ingest build gathers from, so normals
    deviate at the ~1e-2 level near slab-grid cell boundaries; both are
    valid cell-PCA estimates and the plane solve is insensitive at that
    level (tested: ingest-plane converges to the same pose envelope).
    """
    from iterativeclosestpoint_tpu.ops.normals import (
        estimate_normals_cellpca_device,
    )

    def fill(halo):
        halo0 = halo[0]
        real = halo0[:, 0] < _FAR * 0.5
        big = jnp.asarray(_FAR, jnp.float32)
        lo3 = jnp.min(jnp.where(real[:, None], halo0, big), axis=0)
        hi3 = jnp.max(jnp.where(real[:, None], halo0, -big), axis=0)
        cell = jnp.maximum(jnp.max(hi3 - lo3) / resolution, 1e-9)
        nrm = estimate_normals_cellpca_device(
            halo0, lo3, cell, resolution=resolution, mask_far=True
        )
        return nrm[None]

    nrm = jax.shard_map(
        fill, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
        check_vma=False,
    )(part.halo_pts)
    return part._replace(halo_nrm=nrm.astype(part.halo_nrm.dtype))


def _collective_repair(
    axis_name: str,
    repair_budget: int,
    repair_passes: int,
    with_normals: bool,
):
    """Budgeted multi-pass halo-exchange repair with exact tie handling.

    Every pass: compact up to ``repair_budget`` uncertified queries per
    device, ``all_gather`` them, search every slab, combine by pmin(d²)
    with a second pmin over the winners' ORIGINAL target indices for ties
    (reference first-tie order; never averages distinct points — the
    psum/wins division only merges the duplicated halo copies of one and
    the same target point, which is exact)."""

    def repair(query, matched6, dist, certified, halo, gidx, nrm6):
        f = query.dtype
        n_bad = jnp.sum(~certified, dtype=jnp.int32)
        # ALL branch decisions below must be device-uniform (a collective
        # sits inside every branch — a local predicate deadlocks the
        # mesh): gate on the max bad count over devices; per-device
        # overshoot rows are masked by ``live``.
        n_bad_max = jax.lax.pmax(n_bad, axis_name)
        K = min(repair_budget, query.shape[0])

        def one_pass(p, carry):
            matched6, dist = carry

            def do(_):
                perm = jnp.argsort(certified.astype(jnp.int32), stable=True)
                rows = jax.lax.dynamic_slice(perm, (p * K,), (K,))
                q_bad = query[rows]
                live = (p * K + jnp.arange(K, dtype=jnp.int32)) < n_bad

                q_all = jax.lax.all_gather(q_bad, axis_name)  # (D, K, 3)
                D = q_all.shape[0]
                qa = q_all.reshape(D * K, 3)
                li, ld = nn_bruteforce(qa, halo)
                lm = halo[li]                       # (D·K, 3)
                gi = gidx[li]                       # (D·K,) original index
                ld2 = (ld * ld).astype(f)
                gd2 = jax.lax.pmin(ld2, axis_name)
                isw = ld2 <= gd2
                cand = jnp.where(isw, gi, _IMAX)
                gi_min = jax.lax.pmin(cand, axis_name)
                win = (isw & (gi == gi_min)).astype(f)
                wins = jax.lax.psum(win, axis_name)
                lm6 = (
                    jnp.concatenate([lm, nrm6[li]], axis=1)
                    if with_normals
                    else jnp.concatenate([lm, jnp.zeros_like(lm)], axis=1)
                )
                gm6 = jax.lax.psum(lm6 * win[:, None], axis_name) / (
                    jnp.maximum(wins, 1.0)[:, None]
                )
                gd = jnp.sqrt(jnp.maximum(gd2, 0.0))

                rank = jax.lax.axis_index(axis_name)
                z = jnp.zeros((), rank.dtype)
                seg_m = jax.lax.dynamic_slice(gm6, (rank * K, z), (K, 6))
                seg_d = jax.lax.dynamic_slice(gd, (rank * K,), (K,))
                return (
                    matched6.at[rows].set(
                        jnp.where(live[:, None], seg_m, matched6[rows])
                    ),
                    dist.at[rows].set(jnp.where(live, seg_d, dist[rows])),
                )

            return jax.lax.cond(n_bad_max > p * K, do, lambda _: carry, None)

        any_bad = n_bad_max > 0

        def run(carry):
            return jax.lax.fori_loop(0, repair_passes, one_pass, carry)

        matched6, dist = jax.lax.cond(
            any_bad, run, lambda c: c, (matched6, dist)
        )
        return matched6, dist

    return repair


def _partitioned_nn_brute(
    repair_budget: int,
    repair_passes: int,
    axis_name: str,
    with_normals: bool,
):
    """NN closure: exact XLA brute force over the local slab + margin
    certificate + collective repair."""
    repair = _collective_repair(
        axis_name, repair_budget, repair_passes, with_normals
    )

    def nn(query, target_local, state):
        del target_local
        halo, gidx, nrm, x_lo, x_hi = state
        idx, dist = nn_bruteforce(query, halo)
        m6 = jnp.concatenate(
            [halo[idx], nrm[idx] if with_normals else jnp.zeros_like(query)],
            axis=1,
        )

        # Margin certificate, strict: a tie exactly AT the wall could have
        # its twin beyond it — send boundary ties through the repair.
        margin = jnp.minimum(query[:, 0] - x_lo, x_hi - query[:, 0])
        certified = dist < margin
        m6, dist = repair(query, m6, dist, certified, halo, gidx, nrm)
        if with_normals:
            return m6[:, 0:3], dist, m6[:, 3:6]
        return m6[:, 0:3], dist

    return nn


def _partitioned_nn_pallas(
    repair_budget: int,
    repair_passes: int,
    axis_name: str,
    with_normals: bool,
    resolution: int,
    trange: int,
    slabs: int,
    tile_q: int,
    coarse_resolution: int,
    coarse_trange: int,
    fine_kernel: str = "sweep",
):
    """NN closure: the full single-chip exact chain per slab (fine
    slab-sweep → coarse-grid repair → budgeted local brute,
    ops/pallas_nn.nn_colsweep_exact) composed with the halo-margin
    certificate; only margin failures and local-budget overflow reach the
    collective repair."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import nn_colsweep_exact

    repair = _collective_repair(
        axis_name, repair_budget, repair_passes, with_normals
    )

    def nn(query, target_local, state):
        del target_local
        halo, gidx, nrm, x_lo, x_hi, grid, coarse_grid = state
        m3, knrm, dist, cert = nn_colsweep_exact(
            query, halo, grid, coarse_grid,
            nrm if with_normals else None,
            resolution=resolution, coarse_resolution=coarse_resolution,
            trange=trange, coarse_trange=coarse_trange,
            slabs=slabs, tile_q=tile_q, fine=fine_kernel,
            global_fallback=False, return_certified=True,
        )
        m6 = jnp.concatenate([m3, knrm], axis=1)
        margin = jnp.minimum(query[:, 0] - x_lo, x_hi - query[:, 0])
        certified = cert & (dist.astype(jnp.float32) < margin)
        m6, dist = repair(query, m6, dist, certified, halo, gidx, nrm)
        if with_normals:
            return m6[:, 0:3], dist, m6[:, 3:6]
        return m6[:, 0:3], dist

    return nn


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "widen_first", "repair_budget", "repair_passes",
        "mesh", "estimator", "robust", "local_search", "resolution",
        "trange", "slabs", "tile_q", "fine_kernel", "coarse_trange",
    ),
)
def _icp_core_partitioned(
    source, weight, part: PartitionState, carry=None, prep=None, *,
    max_iterations: int, tolerance, sigma_multiplier, widen_first: bool,
    repair_budget: int, repair_passes: int, mesh: Mesh,
    estimator: str = "point", robust: str = "none",
    local_search: str = "brute", resolution: int = 0, trange: int = 0,
    slabs: int = 4, tile_q: int = 128, fine_kernel: str = "sweep",
    coarse_trange: int = 0,
):
    with_normals = estimator == "plane"
    coarse_resolution, coarse_trange = _coarse_params(
        resolution, coarse_trange
    )
    if local_search == "pallas":
        if prep is None:
            raise ValueError(
                "local_search='pallas' requires the _prepare_partitioned "
                "output (grids + layout are built once per run)"
            )
        nn = _partitioned_nn_pallas(
            repair_budget, repair_passes, "dp", with_normals,
            resolution, trange, slabs, tile_q,
            coarse_resolution, coarse_trange, fine_kernel,
        )
    else:
        nn = _partitioned_nn_brute(
            repair_budget, repair_passes, "dp", with_normals,
        )

    if carry is None:
        f = source.dtype
        carry = (
            jnp.eye(4, dtype=f),
            jnp.asarray(1e10, f),
            jnp.asarray(0, jnp.int32),
        )

    if local_search == "pallas":
        src_run_g, w_run_g, grid_g, cgrid_g = prep

        def device_fn(src, src_run, w_run, halo, gidx, nrm, x_lo, x_hi,
                      grid, cgrid, carry_):
            state = (
                halo[0], gidx[0], nrm[0], x_lo[0], x_hi[0],
                jax.tree.map(lambda x: x[0], grid),
                jax.tree.map(lambda x: x[0], cgrid),
            )
            out = icp_core_impl(
                src_run, w_run, jnp.zeros((1, 3), src.dtype), state,
                nn_fn=nn, max_iterations=max_iterations,
                tolerance=tolerance, sigma_multiplier=sigma_multiplier,
                widen_first=widen_first, axis_name="dp",
                estimator=estimator, robust=robust, carry=carry_,
            )
            # Emit the registered shard in the caller's row order (the
            # layout permutation is internal to the NN).
            from iterativeclosestpoint_tpu.ops.se3 import apply_transform

            out = dict(out)
            out["src"] = apply_transform(out["T_cum"], src)
            return out

    out_specs = {k: P() for k in (
        "T_cum", "prev_error", "no_improve", "iter", "stop", "recorded",
        "h_rmse", "h_valid", "h_out", "h_T", "h_mean", "h_std", "h_thr",
    )}
    out_specs["src"] = P("dp")
    if local_search == "pallas":
        return jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(
                P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                P("dp"), P("dp"), P("dp"), P("dp"), P(),
            ),
            out_specs=out_specs,
            check_vma=False,
        )(
            source, src_run_g, w_run_g, part.halo_pts, part.halo_idx,
            part.halo_nrm, part.x_lo, part.x_hi, grid_g, cgrid_g, carry,
        )

    def device_fn_brute(src, w, halo, gidx, nrm, x_lo, x_hi, carry_):
        state = (halo[0], gidx[0], nrm[0], x_lo[0], x_hi[0])
        return icp_core_impl(
            src, w, jnp.zeros((1, 3), src.dtype), state,
            nn_fn=nn, max_iterations=max_iterations, tolerance=tolerance,
            sigma_multiplier=sigma_multiplier, widen_first=widen_first,
            axis_name="dp", estimator=estimator, robust=robust,
            carry=carry_,
        )

    return jax.shard_map(
        device_fn_brute,
        mesh=mesh,
        in_specs=(
            P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
            P(),
        ),
        out_specs=out_specs,
        check_vma=False,
    )(
        source, weight, part.halo_pts, part.halo_idx, part.halo_nrm,
        part.x_lo, part.x_hi, carry,
    )


def prepare_partition(
    target,
    *,
    mesh: Optional[Mesh] = None,
    halo: Optional[float] = None,
    dtype=jnp.float32,
    center: bool = True,
    estimator: str = "point",
    local_search: str = "auto",
    partition_build: str = "auto",
    fine_kernel: str = "auto",
    grid_resolution: Optional[int] = None,
    n_queries_hint: Optional[int] = None,
) -> dict:
    """Pose-invariant per-TARGET prep for :func:`icp_register_partitioned`:
    centering offset, slab PartitionState (+normals in plane mode),
    resolved local-search backend and grid parameters.

    The target never moves during ICP, so everything here is reusable
    across every registration sharing the target — multi-scan graphs
    pass the result as ``prepared_partition=`` per edge (the partition
    analog of register_scans' ``prepared_for`` grid cache; round-3
    verdict W6). ``n_queries_hint`` feeds the zcol cost-model gate's
    padding term (default: the target size — pass the expected source
    size when it differs a lot).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if estimator not in ("point", "plane"):
        raise ValueError(f"unknown estimator {estimator!r}")
    target = np.asarray(target, np.float64)
    offset = hostmath.center_offset(target) if center else np.zeros(3)
    tgt_local = target - offset
    if halo is None:
        halo = 0.02 * float((tgt_local.max(0) - tgt_local.min(0)).max())

    if partition_build == "auto":
        use_device_build = (
            jax.default_backend() == "tpu"
            and jnp.dtype(dtype) == jnp.float32
        )
    else:
        use_device_build = partition_build == "device"

    # Enqueue the big target upload BEFORE the host-side sort/slab
    # selection/estimator passes (seconds at 10M): the transfer queue
    # is FIFO and device_put is async, so that host work rides under
    # the transfer instead of serializing ahead of it.
    tgt_dev_early = (
        jax.device_put(tgt_local.astype(np.float32))
        if use_device_build else None
    )

    sels, los, his = _slab_selection(tgt_local, n_dev, halo)
    m_loc = -(-max(len(s) for s in sels) // 128) * 128

    if use_device_build:
        part = build_partition_device(
            tgt_local, n_dev, halo, mesh,
            with_normals=(estimator == "plane"),
            sels=sels, los=los, his=his,
            target_dev=tgt_dev_early,
        )
    else:
        normals = None
        if estimator == "plane":
            # Device normals build + one pull (the host cell-PCA
            # allocates O(R³) f64 moment arrays — ~2 min of numpy at
            # 10M/R=256, vs ~2 s on device including the tunnel pull).
            from iterativeclosestpoint_tpu.ops.normals import (
                estimate_normals_cellpca_device,
            )

            r0 = auto_resolution_data(tgt_local)
            tmin = tgt_local.min(axis=0)
            ext0 = float((tgt_local.max(axis=0) - tmin).max()) or 1.0
            normals = np.asarray(
                estimate_normals_cellpca_device(
                    jnp.asarray(tgt_local, jnp.float32),
                    jnp.asarray(tmin, jnp.float32),
                    jnp.asarray(max(ext0 / r0, 1e-9), jnp.float32),
                    resolution=r0,
                )
            ).astype(dtype)
        part = build_partition(tgt_local, n_dev, halo, dtype=dtype,
                               normals=normals)

    if local_search == "auto":
        local_search = (
            "pallas"
            if (jax.default_backend() == "tpu" and m_loc > 131072
                and jnp.dtype(dtype) == jnp.float32)
            else "brute"
        )
    resolution = trange = coarse_trange = 0
    if local_search == "pallas":
        from iterativeclosestpoint_tpu.ops.pallas_nn import (
            resolve_slab_grid_params,
        )

        # Shared static grid params: per-slab data-adaptive estimates
        # from the HOST slices (pulling the assembled slab buffers back
        # through the tunnel costs ~2 s at 10M), maxed across devices and
        # ladder-quantized by the single shared resolver (the streamed
        # ingest sampler must pick identically).
        p = resolve_slab_grid_params(
            [tgt_local[s] for s in sels if len(s)],
            n_dev=n_dev, n_queries=(n_queries_hint or len(target)),
            grid_resolution=grid_resolution, fine_kernel=fine_kernel,
        )
        resolution = p["resolution"]
        trange = p["trange"]
        coarse_trange = p["coarse_trange"]
        fine_kernel = p["fine_kernel"]
    else:
        fine_kernel = "sweep"

    return dict(
        mesh=mesh, offset=offset, halo=float(halo), part=part,
        m_loc=m_loc, local_search=local_search, resolution=resolution,
        trange=trange, coarse_trange=coarse_trange,
        fine_kernel=fine_kernel, with_normals=(estimator == "plane"),
        dtype=jnp.dtype(dtype),
    )


def icp_register_partitioned(
    source,
    target,
    *,
    mesh: Optional[Mesh] = None,
    halo: Optional[float] = None,
    repair_budget: int = 1024,
    repair_passes: int = 4,
    max_iterations: int = 50,
    tolerance: float = 1e-6,
    sigma_multiplier: float = 3.0,
    mode: str = "gui",
    estimator: str = "point",
    robust: str = "none",
    local_search: str = "auto",
    partition_build: str = "auto",
    fine_kernel: str = "auto",
    grid_resolution: Optional[int] = None,
    dtype=jnp.float32,
    center: bool = True,
    return_registered: bool = True,
    initial_transform: Optional[np.ndarray] = None,
    segment_iterations: int = 0,
    progress_callback: Optional[Callable] = None,
    stop_event=None,
    segment_callback: Optional[Callable] = None,
    resume_carry=None,
    partition_state=None,
    source_global=None,
    offset=None,
    prepared_partition: Optional[dict] = None,
    grid_params: Optional[dict] = None,
) -> ICPResult:
    """ICP with the target spatially partitioned across the mesh.

    ``partition_state`` + ``source_global`` (+ ``offset``): pre-built
    global device inputs from parallel.ingest
    (load_las_partitioned_target / _source) — the multi-process streamed
    ingest where no process ever holds the full cloud. ``source`` and
    ``target`` are ignored (pass None); ``return_registered=False`` is
    required (the wall-sharded row order has no global permutation back
    to file order; the transform/history are the product). With
    ``grid_params`` (parallel.ingest.estimate_partition_grid_params —
    per-slab parameters from a strided file sample) the run uses the
    full certified Pallas kernel chain per slab; without it, "auto"
    falls back to the per-slab brute search.

    ``prepared_partition`` (non-ingest runs): the pose-invariant
    per-target prep from :func:`prepare_partition`, reusable across
    registrations sharing a target (multi-scan edges). When given, the
    ``halo``/``local_search``/``partition_build``/``fine_kernel``/
    ``grid_resolution`` arguments are ignored — they were resolved at
    prep time.

    ``resume_carry`` mirrors models.icp.icp_register: the full
    convergence carry {transform, prev_error, no_improve[,
    transform_local, offset]} from a segment-boundary checkpoint. The
    partitioned loop state is a pure function of that carry (the body
    recomputes the source from the pristine source; the slab layout and
    grids are pose-invariant), so the continued trajectory is
    bit-identical to the uninterrupted run — same contract as the
    single-device and dp paths (round-2 verdict W3: resume here was
    pose-only with counters reset).

    ``halo`` defaults to 2% of the cloud extent — generous against
    expected post-coarse correspondence distances; widen it (or pass a
    coarse ``initial_transform``) for badly misaligned pairs.

    ``local_search``: "auto" picks the Pallas slab-sweep kernel on TPU
    when a slab is too large for the all-pairs form, XLA brute force
    otherwise. ``partition_build``: "auto" assembles the slab buffers on
    device on TPU/f32 (build_partition_device — one target upload instead
    of ~5× its bytes of slab/normal traffic), host build otherwise.
    ``estimator``/``robust`` mirror models.icp.icp_register
    (plane mode partitions per-point normals alongside the slabs).
    ``segment_iterations``/callbacks/stop mirror the segmented-dispatch
    surface (auto-enabled ≥2M points — the TPU-worker watchdog guard).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if estimator not in ("point", "plane"):
        raise ValueError(f"unknown estimator {estimator!r}")

    if partition_state is not None:
        if source_global is None or offset is None:
            raise ValueError(
                "partition_state requires source_global and offset "
                "(parallel.ingest.load_las_partitioned_* provide them)"
            )
        if initial_transform is not None:
            raise ValueError(
                "partition_state with initial_transform is not supported "
                "(resume through resume_carry instead)"
            )
        if return_registered:
            raise ValueError(
                "partition_state requires return_registered=False (the "
                "wall-sharded order has no global inverse permutation)"
            )
        offset = np.asarray(offset, np.float64)
        n_orig = int(source_global[2])
        T_init = None
        part = partition_state
        if estimator == "plane":
            # Ingest-built states carry zero normals; estimate per slab
            # on device (slab+halo covers every neighborhood). The
            # normals grid honors the grid_resolution knob (ADVICE r3:
            # it was pinned at 64 regardless of the config) or the
            # sampled estimate.
            part = fill_partition_normals(
                part, mesh=mesh,
                resolution=grid_resolution
                or (grid_params or {}).get("normals_resolution")
                or (grid_params or {}).get("resolution")
                or 64,
            )
        src_dev, w_dev = source_global[0], source_global[1]
        perm = None
        if grid_params is not None and local_search in ("auto", "pallas"):
            # Sampled per-slab grid params (round-3 verdict W2:
            # parallel.ingest.estimate_partition_grid_params computes
            # them from a strided file sample — no process ever holds a
            # slab) unlock the certified Pallas kernel chain on the
            # beyond-RAM path; the per-device grids build on device from
            # the sharded slab buffers exactly as the host-array path.
            local_search = "pallas"
            resolution = grid_params["resolution"]
            trange = grid_params["trange"]
            coarse_trange = grid_params["coarse_trange"]
            fine_kernel = grid_params["fine_kernel"]
            prep = _prepare_partitioned(
                src_dev, w_dev, part, mesh=mesh, resolution=resolution,
                trange=trange, tile_q=128,
                with_normals=(estimator == "plane"),
                fine_kernel=fine_kernel, coarse_trange=coarse_trange,
            )
        else:
            if local_search == "auto":
                local_search = "brute"
            if local_search != "brute":
                raise ValueError(
                    "partition_state with local_search='pallas' needs "
                    "grid_params (parallel.ingest."
                    "estimate_partition_grid_params — per-slab grid "
                    "parameters from the strided file sample)"
                )
            resolution = trange = coarse_trange = 0
            fine_kernel = "sweep"
            prep = None
    else:
        source = np.asarray(source, np.float64)
        n_orig = len(source)
        T_init = None
        if initial_transform is not None:
            if resume_carry is not None:
                raise ValueError(
                    "initial_transform cannot combine with resume_carry "
                    "(the carry's transform already includes any initial "
                    "pose)"
                )
            T_init = np.asarray(initial_transform, np.float64)
            source = source @ T_init[:3, :3].T + T_init[:3, 3]
        if prepared_partition is None:
            prepared_partition = prepare_partition(
                target, mesh=mesh, halo=halo, dtype=dtype, center=center,
                estimator=estimator, local_search=local_search,
                partition_build=partition_build, fine_kernel=fine_kernel,
                grid_resolution=grid_resolution,
                n_queries_hint=n_orig,
            )
        pp = prepared_partition
        if pp["with_normals"] != (estimator == "plane"):
            raise ValueError(
                "prepared_partition was built with with_normals="
                f"{pp['with_normals']} but estimator={estimator!r} — "
                "rebuild the partition to match"
            )
        if pp["dtype"] != jnp.dtype(dtype):
            raise ValueError(
                f"prepared_partition was built with dtype={pp['dtype']} "
                f"but this run asks for {jnp.dtype(dtype)} — rebuild the "
                "partition to match"
            )
        offset = pp["offset"]
        part = pp["part"]
        local_search = pp["local_search"]
        resolution = pp["resolution"]
        trange = pp["trange"]
        coarse_trange = pp["coarse_trange"]
        fine_kernel = pp["fine_kernel"]
        src_local = source - offset

        # Sort source by x so equal-count shards line up with the target's
        # x-quantile slabs (the clouds nearly coincide after coarse alignment);
        # residual mismatch is absorbed by the halo + collective repair.
        perm = np.argsort(src_local[:, 0], kind="stable")
        src_sorted = src_local[perm]

        src_pad, w = pad_to_multiple(src_sorted.astype(dtype), n_dev)
        src_dev = jnp.asarray(src_pad)
        w_dev = jnp.asarray(w)

        prep = None
        if local_search == "pallas":
            prep = _prepare_partitioned(
                src_dev, w_dev, part, mesh=mesh, resolution=resolution,
                trange=trange, tile_q=128, with_normals=(estimator == "plane"),
                fine_kernel=fine_kernel, coarse_trange=coarse_trange,
            )

    widen = mode == "gui"
    carry = None
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
            # matrix (the world rebase round-trips through catastrophic
            # cancellation at UTM scale).
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
        per_chip = max(n_orig // max(n_dev, 1), 1)
        segment_iterations = max(2, int(8_000_000 // max(per_chip, 1)))

    static = dict(
        tolerance=tolerance, sigma_multiplier=sigma_multiplier,
        repair_budget=repair_budget, repair_passes=repair_passes,
        mesh=mesh, estimator=estimator, robust=robust,
        local_search=local_search, resolution=resolution, trange=trange,
        fine_kernel=fine_kernel, coarse_trange=coarse_trange,
    )

    def dispatch(carry_, seg_n, widen_):
        return _icp_core_partitioned(
            src_dev, w_dev, part, carry_, prep,
            max_iterations=seg_n, widen_first=widen_, **static,
        )

    if segment_iterations and segment_iterations > 0:
        out = _run_segmented(
            dispatch, offset, src_dev.dtype,
            max_iterations=max_iterations,
            segment_iterations=segment_iterations,
            widen_first=widen,
            progress_callback=progress_callback, stop_event=stop_event,
            carry_init=carry, segment_callback=segment_callback,
        )
    else:
        out = dispatch(carry, max_iterations, widen)
    out = dict(out)
    if perm is None:
        # Ingest mode: the wall-sharded registered cloud has no global
        # inverse permutation (return_registered=False is enforced) and
        # its shards span processes — drop it before packaging.
        del out["src"]
    else:
        out["src"] = out["src"][: len(source)]
    res = package_result(out, offset, return_registered)
    if perm is not None and res.source_registered is not None:
        unperm = np.empty_like(res.source_registered)
        unperm[perm] = res.source_registered
        res.source_registered = unperm
    if T_init is not None:
        res.transform = res.transform @ T_init
        res.history_transform = res.history_transform @ T_init
        res.carry_transform_local = None
        res.center_offset = None
    return res
