"""Cell-blocked exact 1-NN: the fast TPU formulation of grid search.

Motivation (measured on TPU v5e): XLA row-gathers cost ~30 ns/row, so the
naive voxel-grid query (27 cells × K candidates gathered *per query*,
ops/hashgrid.py) moves ~250 rows per query — hundreds of ms per ICP
iteration at 1M points. This module restructures the same search so that
spatially-coherent *tiles* of queries share one candidate slab fetched as
a handful of **contiguous runs** (dynamic slices, not gathers):

  * the target is sorted once by linearized cell id ((cx·R)+cy)·R+cz, so
    the 27-neighborhood of a cell block is a few contiguous z-runs of the
    sorted array (one run per (x, y) column, covering [minz-1, maxz+1]);
  * queries are sorted once (host-side, before the ICP loop) by the Morton
    code of their *initial* cell — rigid motion preserves spatial
    coherence, so tiles stay compact through every iteration;
  * per tile of TILE_Q queries: compute the tile's cell bounding box,
    enumerate ≤ RUNS (x, y) columns of the box dilated by one cell, slice
    each column's z-run (≤ RUN_LEN rows), and brute-force the tile against
    the slab on the VPU — dense, fixed-shape, fusion-friendly;
  * exactness certificate per query: the searched region covers every cell
    within one cell of the tile bbox, so a best distance ≤ cell_size
    proves no unsearched point can be closer (same argument as
    ops/hashgrid.py); tiles whose box or runs exceed the static caps are
    marked incomplete and their queries uncertified;
  * uncertified queries (far outliers, straddling tiles, first badly
    misaligned iterations) are resolved *exactly* by budgeted brute-force
    passes: up to BRUTE_PASSES batches of BRUTE_BATCH queries are
    compacted and matched against the full target on the MXU; only if even
    that budget overflows does one global lax.cond brute-force pass run.

Replaces the reference octree's role (core/octree.cpp) at scale; same 1-NN
semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
from iterativeclosestpoint_tpu.utils.hostmath import bbox

_BIG = 1.0e18


class CellGrid(NamedTuple):
    sorted_pts: jnp.ndarray   # (M + RUN_PAD, 3) cell-sorted target + far pad
    sorted_idx: jnp.ndarray   # (M,) original index per sorted row
    cell_start: jnp.ndarray   # (R³+1,) CSR row offsets
    origin: jnp.ndarray       # (3,)
    cell_size: jnp.ndarray    # ()


def morton_encode(cells: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleave-bits Morton code of (N, 3) non-negative int cell coords."""
    code = np.zeros(len(cells), np.uint64)
    c = cells.astype(np.uint64)
    for b in range(bits):
        for a in range(3):
            code |= ((c[:, a] >> b) & 1) << np.uint64(3 * b + a)
    return code


def _occupancy_model(target: np.ndarray, probe: int = 32):
    """(c1, d): occupied-cell count at resolution ``probe`` and the
    cloud's estimated box dimension (≈2 scan surface, ≈3 volume).

    The occupancy probes only estimate the cloud's box dimension d;
    above 2M points a strided subsample still hits essentially every
    occupied probe cell (≥7 samples/cell at probe 64 even on a 10M
    uniform volume), so the O(N) cellize pass is bounded. Below the
    cap the full array is used — zero behavior change there. Above it,
    sampled occupancy is a LOWER bound on true occupancy (long sparse
    tails — isolated outlier returns in real LAS — can be skipped), so
    on heavy-tailed clouds the estimated d can dip and R round UP one
    pow-2 notch versus the full scan; the pow-2 quantization plus the
    [8, 512] clip bound the effect to that single notch."""
    tmin, tmax = bbox(target)
    extent = float((tmax - tmin).max()) or 1.0
    probe_target = target[:: max(1, len(target) // 2_000_000)]

    # ONE cellize pass at 2·probe; the probe-scale occupancy derives
    # exactly from it (cells at probe are the 2·probe cells with
    # coordinates >> 1: floor(floor(y)/2) == floor(y/2) for y ≥ 0).
    # Halves the dominant cost of this estimator (~88 → ~45 ms at 1M —
    # it sits on the synced fixed-cost path of every registration).
    r2 = probe * 2
    c = np.clip((probe_target - tmin) / (extent / r2), 0, r2 - 1).astype(
        np.int32
    )
    cid2 = (c[:, 0] * r2 + c[:, 1]) * r2 + c[:, 2]
    occ2 = np.zeros(r2 * r2 * r2, np.bool_)
    occ2[cid2] = True
    c2 = max(int(occ2.sum()), 1)
    ch = c >> 1
    cid1 = (ch[:, 0] * probe + ch[:, 1]) * probe + ch[:, 2]
    occ1 = np.zeros(probe * probe * probe, np.bool_)
    occ1[cid1] = True
    c1 = max(int(occ1.sum()), 1)
    d = min(max(np.log2(c2 / c1), 1.0), 3.0)
    return c1, d


def surface_boost_ok(
    target: np.ndarray, resolution: int, *,
    population: "int | None" = None, occupancy: int = 32, probe: int = 32,
    model: "tuple[int, float] | None" = None,
) -> bool:
    """True iff the surface-boost gate passes with ``resolution`` as the
    BOOSTED grid resolution on this cloud (or strided sample with
    ``population`` carrying the true count): box dimension d ≤ 2.45 AND
    predicted occupancy at ``resolution`` ≥ ``occupancy`` (the measured
    safe edge for the coarse→fine ladder handoff — see
    ``auto_resolution_data``). The partitioned resolver calls this per
    slab so a dense slab cannot force a boosted R onto sparser slabs
    whose own occupancy sits below the safe edge.

    ``model``: a precomputed ``_occupancy_model(target, probe)`` result
    — callers that already ran the probe pass (estimate_grid_params,
    resolve_slab_grid_params) reuse it instead of paying the O(N)
    cellize again (~45 ms at the 2M sample cap)."""
    target = np.asarray(target)
    if resolution > 512:
        return False
    c1, d = model if model is not None else _occupancy_model(target, probe)
    pop = population if population is not None else len(target)
    return bool(
        d <= 2.45 and pop / (c1 * (resolution / probe) ** d) >= occupancy
    )


def auto_resolution_data(
    target: np.ndarray, occupancy: int = 128, probe: int = 32,
    population: "int | None" = None,
    surface_boost_occupancy: "int | None" = None,
    return_base: bool = False,
    model: "tuple[int, float] | None" = None,
) -> "int | tuple[int, int]":
    """Data-aware resolution: probe occupied-cell counts at two scales to
    estimate the cloud's box dimension d (≈2 for scan surfaces, ≈3 for
    volumes), then pick R with mean occupied-cell occupancy ≈ ``occupancy``
    (the measured sweet spot for tile certification vs slab size).

    ``population``: when ``target`` is a strided sample of a larger
    cloud (streamed-ingest slab estimation), the true point count — the
    occupancy target is sized for the full cloud.

    ``surface_boost_occupancy``: round-4 re-tune for the fused-buffer
    sweep kernel (ops/pallas_nn._colsweep_fused_kernel). The fused form
    removed the short-chunk fixed-cost penalty, so on surface-like
    clouds (d ≤ 2.45) one pow-2 notch finer halves the candidate count
    ~for free: measured 36.1 → 25.6 ms/iter (+41%) on the 1M-terrain
    bench fine loop at R 64 → 128. The boost only applies when the
    boosted grid keeps ≥ ``surface_boost_occupancy`` points per occupied
    cell — below that the cells are so small relative to the point
    spacing that the coarse→fine ladder handoff starts outside the cell
    size and the certified path degrades into per-iteration repair
    (measured collapses, tools/exp_res_retune.py: 1M terrain at R=256 /
    8 pts/cell = 202 ms/iter; 800k strip at R=256 / 21 pts/cell =
    1296 ms/iter — while 1M at R=128 / 32 pts/cell and 10M at R=256 /
    150 pts/cell run certified). 32 is the measured-safe edge. Pass
    ``None`` (default) for non-sweep consumers (cell-PCA normals
    resolution, the cellblock backend) — their tuning predates and does
    not involve the fused kernel.

    ``return_base=True`` returns ``(resolution, base_resolution)`` where
    base ignores the boost — callers that size normals estimation keep
    the base (a boosted PCA cell would quarter the points per cell)."""
    target = np.asarray(target)
    c1, d = model if model is not None else _occupancy_model(target, probe)
    pop = population if population is not None else len(target)
    # cells(R) ≈ c1 · (R/probe)^d ; want pop/cells(R) ≈ occupancy.
    r = probe * (pop / (occupancy * c1)) ** (1.0 / d)
    r = 1 << int(np.clip(np.round(np.log2(max(r, 1))), 3, 9))
    base = int(r)
    r = base
    if (
        surface_boost_occupancy is not None
        and d <= 2.45
        and base < 512
        and pop / (c1 * ((2 * base) / probe) ** d)
        >= surface_boost_occupancy
    ):
        r = base * 2
    if return_base:
        return int(r), base
    return int(r)


def auto_resolution(n_target: int, occupancy: int = 256) -> int:
    """Grid resolution heuristic for surface-like clouds (occupied cells
    scale ~k·R² with k ≈ 2 z-layers): R ≈ sqrt(M / occupancy) gives
    ~100-150 points per occupied cell — measured sweet spot where a
    128-query Morton tile spans ≲ 2 cells per axis (cert ≈ 99%) while the
    per-tile slab stays a few hundred rows. Powers of two in [16, 512]."""
    r = int(np.sqrt(max(n_target, 1) / occupancy))
    r = 1 << max(4, min(9, int(np.ceil(np.log2(max(r, 16))))))
    return r


def build_cellgrid(
    target: np.ndarray,
    resolution: int,
    run_pad: int = 512,
    dtype=np.float32,
):
    """Host-side build: sort target by linear cell id, CSR offsets, padding."""
    target = np.asarray(target)
    R = resolution
    tmin, tmax = bbox(target)
    cell = max(float((tmax - tmin).max()) / R, 1e-9)

    coords = np.clip(((target - tmin) / cell).astype(np.int64), 0, R - 1)
    cid = (coords[:, 0] * R + coords[:, 1]) * R + coords[:, 2]
    order = np.argsort(cid, kind="stable")
    sorted_cid = cid[order]
    cell_start = np.searchsorted(sorted_cid, np.arange(R**3 + 1)).astype(np.int32)

    pts = np.full((len(target) + run_pad, 3), 1e15, dtype)
    pts[: len(target)] = target[order]

    return CellGrid(
        sorted_pts=jnp.asarray(pts),
        sorted_idx=jnp.asarray(order, jnp.int32),
        cell_start=jnp.asarray(cell_start),
        origin=jnp.asarray(tmin, dtype),
        cell_size=jnp.asarray(cell, dtype),
    )


def morton_order(points: np.ndarray, resolution: int) -> np.ndarray:
    """Query permutation: Morton order of the points' cells (host, once)."""
    pmin, pmax = bbox(points)
    extent = float((pmax - pmin).max())
    cell = max(extent / resolution, 1e-9)
    coords = np.clip(((points - pmin) / cell).astype(np.int64), 0, resolution - 1)
    return np.argsort(morton_encode(coords), kind="stable")


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "tile_q", "runs_xy", "run_len", "tile_group"),
)
def nn_cellblock(
    query: jnp.ndarray,
    grid: CellGrid,
    *,
    resolution: int,
    tile_q: int = 128,
    runs_xy: int = 6,      # (x, y) columns per axis of the dilated box
    run_len: int = 512,    # max rows per column run
    tile_group: int = 8,   # tiles processed per sequential map step
):
    """Tile-blocked grid 1-NN.

    ``query`` should be Morton-sorted (see ``morton_order``) for tile
    coherence; it is padded here to a tile multiple by replicating the last
    row (keeps the final tile spatially compact). Returns
    (idx (N,) original target indices, dist (N,), certified (N,) bool).
    """
    R = resolution
    n_in = query.shape[0]
    step = tile_q * tile_group
    n = -(-n_in // step) * step
    if n != n_in:
        query = jnp.concatenate(
            [query, jnp.broadcast_to(query[-1], (n - n_in, 3))], axis=0
        )
    f = query.dtype
    m_rows = grid.sorted_pts.shape[0]
    big = jnp.asarray(_BIG, f)
    n_runs = runs_xy * runs_xy

    qc_f = (query - grid.origin) / grid.cell_size
    qcell = jnp.floor(qc_f).astype(jnp.int32)
    inside = jnp.all((qcell >= 0) & (qcell < R), axis=1)
    qcell_cl = jnp.clip(qcell, 0, R - 1)

    t = n // tile_q
    q_t = query.reshape(t, tile_q, 3)
    qc_t = qcell_cl.reshape(t, tile_q, 3)

    minc = jnp.min(qc_t, axis=1)  # (t, 3)
    maxc = jnp.max(qc_t, axis=1)

    # Column box anchored at the tile's min cell minus one. A query is
    # *individually* certified when its own ±1 neighborhood lies inside the
    # box and every one of its 9 columns fit the run-length cap — so a few
    # straggler queries in a wide tile go to repair without invalidating
    # the rest of the tile.
    bx = minc[:, 0] - 1  # (t,)
    by = minc[:, 1] - 1
    ri = jnp.arange(n_runs, dtype=jnp.int32)
    cx = bx[:, None] + ri[None, :] // runs_xy  # (t, n_runs)
    cy = by[:, None] + ri[None, :] % runs_xy
    col_ok = (cx >= 0) & (cx < R) & (cy >= 0) & (cy < R)
    cx_cl = jnp.clip(cx, 0, R - 1)
    cy_cl = jnp.clip(cy, 0, R - 1)

    z_lo = jnp.clip(minc[:, 2] - 1, 0, R - 1)  # (t,)
    z_hi = jnp.clip(maxc[:, 2] + 1, 0, R - 1)
    cid_lo = (cx_cl * R + cy_cl) * R + z_lo[:, None]
    cid_hi = (cx_cl * R + cy_cl) * R + z_hi[:, None]
    run_start = grid.cell_start[cid_lo]          # (t, n_runs)
    run_end = grid.cell_start[cid_hi + 1]
    run_start = jnp.where(col_ok, run_start, 0)
    run_end = jnp.where(col_ok, run_end, 0)
    col_fits = run_end - run_start <= run_len     # (t, n_runs)

    # Per-query coverage: x/y neighborhood inside the box columns …
    qx = qc_t[..., 0]  # (t, tile_q)
    qy = qc_t[..., 1]
    in_box = (qx - bx[:, None] + 1 <= runs_xy - 1) & (
        qy - by[:, None] + 1 <= runs_xy - 1
    )
    # … and all 9 of the query's columns within the run cap.
    ox = qx - bx[:, None]  # (t, tile_q) column coords of the query cell
    oy = qy - by[:, None]
    q_cols_fit = jnp.ones_like(in_box)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            ci = jnp.clip(ox + dx, 0, runs_xy - 1) * runs_xy + jnp.clip(
                oy + dy, 0, runs_xy - 1
            )
            q_cols_fit &= jnp.take_along_axis(col_fits, ci, axis=1)
    query_complete = (in_box & q_cols_fit).reshape(n)

    base = jnp.minimum(run_start, m_rows - run_len)  # slice anchor

    def one_tile(args):
        qt, b, s, e = args  # (tile_q,3), (n_runs,), (n_runs,), (n_runs,)

        def one_run(carry, rargs):
            best_d2, best_row = carry
            bb, ss, ee = rargs
            slab = jax.lax.dynamic_slice(
                grid.sorted_pts, (bb, jnp.zeros((), bb.dtype)), (run_len, 3)
            )  # contiguous rows
            rows = bb + jnp.arange(run_len, dtype=jnp.int32)
            ok = (rows >= ss) & (rows < ee)
            diff = qt[:, None, :] - slab[None, :, :]
            d2 = jnp.sum(diff * diff, axis=-1)  # (tile_q, run_len)
            d2 = jnp.where(ok[None, :], d2, big)
            j = jnp.argmin(d2, axis=1)
            dmin = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
            rmin = rows[j]
            take = dmin < best_d2
            return (
                jnp.where(take, dmin, best_d2),
                jnp.where(take, rmin, best_row),
            ), None

        init = (
            jnp.full((tile_q,), big, f),
            jnp.zeros((tile_q,), jnp.int32),
        )
        (d2, row), _ = jax.lax.scan(one_run, init, (b, s, e))
        return d2, row

    def group_fn(args):
        return jax.vmap(one_tile)((args[0], args[1], args[2], args[3]))

    g = tile_group
    tg = t // g
    d2, row = jax.lax.map(
        group_fn,
        (
            q_t.reshape(tg, g, tile_q, 3),
            base.reshape(tg, g, n_runs),
            run_start.reshape(tg, g, n_runs),
            run_end.reshape(tg, g, n_runs),
        ),
    )
    d2 = d2.reshape(n)
    row = row.reshape(n)

    found = d2 < big
    idx = jnp.where(
        found, grid.sorted_idx[jnp.minimum(row, grid.sorted_idx.shape[0] - 1)], 0
    )
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    certified = inside & query_complete & found & (dist <= grid.cell_size)
    return idx[:n_in], dist[:n_in], certified[:n_in]


@functools.partial(
    jax.jit,
    static_argnames=(
        "resolution", "tile_q", "runs_xy", "run_len", "tile_group",
        "brute_batch", "brute_passes",
    ),
)
def nn_cellblock_exact(
    query: jnp.ndarray,
    target: jnp.ndarray,
    grid: CellGrid,
    *,
    resolution: int,
    tile_q: int = 128,
    runs_xy: int = 6,
    run_len: int = 512,
    tile_group: int = 8,
    brute_batch: int = 4096,
    brute_passes: int = 16,
):
    """Exact 1-NN: cell-blocked grid + budgeted brute repair + global cond.

    Every query ends up exact: certified queries come from the grid path;
    uncertified ones are compacted into ≤ brute_passes batches matched
    against the full target (each pass is skipped by lax.cond when its
    batch is empty); if the budget would overflow, one global brute pass
    resolves everything.
    """
    idx, dist, certified = nn_cellblock(
        query, grid, resolution=resolution, tile_q=tile_q, runs_xy=runs_xy,
        run_len=run_len, tile_group=tile_group,
    )
    bad = ~certified
    n_bad = jnp.sum(bad, dtype=jnp.int32)
    B = brute_batch

    def repair(carry):
        # Compact uncertified queries to the front once (stable argsort of
        # the certificate: False sorts first), then fix them in ≤ P batches
        # of B; all scatter/gather work is B-sized, not N-sized.
        idx0, dist0 = carry
        perm = jnp.argsort(certified.astype(jnp.int32), stable=True)
        q_perm = query[perm]
        # Pad to a batch multiple so the last pass's dynamic_slice never
        # clamps its start (which would desynchronize rows from the live
        # mask). Padding rows carry index 0 and live=False → no-op writes.
        n_q = q_perm.shape[0]
        n_pad = -(-n_q // B) * B
        if n_pad != n_q:
            q_perm = jnp.pad(q_perm, ((0, n_pad - n_q), (0, 0)))
            perm = jnp.pad(perm, (0, n_pad - n_q))

        def pass_body(p, c):
            idx_c, dist_c = c

            def do(_):
                qb = jax.lax.dynamic_slice(q_perm, (p * B, 0), (B, 3))
                rows = jax.lax.dynamic_slice(perm, (p * B,), (B,))
                bi, bd = nn_bruteforce(qb, target)
                live = p * B + jnp.arange(B, dtype=jnp.int32) < n_bad
                return (
                    idx_c.at[rows].set(jnp.where(live, bi, idx_c[rows])),
                    dist_c.at[rows].set(jnp.where(live, bd, dist_c[rows])),
                )

            return jax.lax.cond(n_bad > p * B, do, lambda _: c, None)

        return jax.lax.fori_loop(0, brute_passes, pass_body, (idx0, dist0))

    idx, dist = jax.lax.cond(
        n_bad > 0, repair, lambda c: c, (idx, dist)
    )

    # Budget overflow (pathological): resolve globally, exactly.
    idx, dist = jax.lax.cond(
        n_bad > brute_passes * B,
        lambda _: nn_bruteforce(query, target),
        lambda _: (idx, dist),
        None,
    )
    return idx, dist


def make_cellblock_nn(
    target_local: np.ndarray,
    resolution: int | None = None,
    run_len: int = 512,
    dtype=np.float32,
):
    """Build grid + return (nn_fn, nn_state, resolution) for the ICP driver."""
    if resolution is None:
        resolution = auto_resolution_data(target_local)
    grid = build_cellgrid(
        target_local, resolution, run_pad=run_len, dtype=dtype
    )
    return _cellblock_fn(resolution, run_len), grid, resolution


@functools.lru_cache(maxsize=None)
def _cellblock_fn(resolution: int, run_len: int):
    def fn(query, target, nn_state):
        idx, dist = nn_cellblock_exact(
            query, target, nn_state, resolution=resolution, run_len=run_len
        )
        return target[idx], dist

    return fn
