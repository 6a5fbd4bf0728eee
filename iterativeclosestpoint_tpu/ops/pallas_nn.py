"""Pallas TPU kernel for grid 1-NN: the slab-sweep formulation.

This is the hot-loop-A kernel named in BASELINE.json ("Pallas kernels for
the NN-search … hot loops"), replacing the reference octree's per-query
recursive search (core/octree.cpp:128-184) with a memory-shaped design:

  * the target is sorted by linearized cell id (x-major) once per
    registration — build shared with ops/cellblock — and stored
    coordinate-transposed (3, M) so a *slab range* (one x-slab of the
    grid, y restricted to the tile's dilated span, all z) is one
    contiguous block of columns;
  * queries are laid out once on host in the x-group-aligned tile order
    (``grouped_tile_order``: cell-sorted, padded per x-row so no tile
    crosses an x boundary — tile coherence survives rigid motion); each
    kernel program owns one tile of TILE_Q queries held in VMEM, computes
    nothing per query in HBM;
  * per program: ≤ SLABS async DMA copies bring the tile's candidate
    slabs into a double-buffered VMEM scratch (copy s+1 in flight while
    slab s is processed); the tile × slab distance matrix is evaluated
    densely on the VPU with NO row masks (extra rows in a slab window are
    real target points — a candidate superset keeps the certificate
    argument intact); winning coordinates are extracted with a one-hot
    MXU contraction (no in-kernel gather) so the ICP driver never gathers
    by index afterwards;
  * coverage per tile = slabs [minx-1 … maxx+1] × y ∈ [miny-1 … maxy+1],
    full z — a superset of every query's 27-neighborhood; a found
    distance within the query's distance-to-window-edge (grid-boundary
    edges count as infinite, so outside-bbox queries certify too)
    certifies exactness. Steady state under coarse-to-fine init measures
    100% certified at 1M pts; the coarse-level and budgeted brute-force
    repairs (cond-gated, tile-granular) exist for cold starts and
    adversarial geometry, with a global fallback cond behind them.

Arithmetic is f32 throughout (coordinates are pre-centered by the f64
global offset; see models/icp.py).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
from iterativeclosestpoint_tpu.utils.hostmath import bbox
from iterativeclosestpoint_tpu.ops.cellblock import auto_resolution_data

_BIG = 1.0e18
_FAR = 1.0e6  # padding coordinate: far but square-safe in f32
# Scalar-prefetch operands live in SMEM (1 MB total); leave headroom for
# other SMEM users. Tests shrink this to exercise the tile-split path.
_SMEM_PREFETCH_BUDGET = 786_432


class PallasGrid(NamedTuple):
    tgt_t: jnp.ndarray       # (8, M + TRANGE) cell-sorted, transposed, padded
                             # (rows 0-2 = x,y,z; rows 3-7 pad — TPU sublane=8)
    col_start: jnp.ndarray   # (R²+1,) CSR offsets at (x,y)-COLUMN granularity
                             # — the sweep only ever reads full-z column
                             # boundaries, and R²+1 searchsorted queries cost
                             # ~1 ms where the R³+1 form cost 40 ms at 1M pts
                             # (binary-search row gathers dominate the build)
    origin: jnp.ndarray      # (3,)
    cell_size: jnp.ndarray   # ()
    bbox_hi: jnp.ndarray     # (3,) TRUE target bbox max corner (same frame
                             # as origin): the grid cube spans the longest
                             # axis in every dim, so out-of-bbox gaps for
                             # the certificate must use the real extents


class ZPallasGrid(NamedTuple):
    """Grid for the z-window COLUMN sweep (volume regime): same sorted
    layout as PallasGrid but with the full R³ CSR, so a tile can DMA just
    the z-window of each (x, y) column instead of whole columns."""

    tgt_t: jnp.ndarray       # (8, M + zrange) cell-sorted, transposed
    cell_start: jnp.ndarray  # (R³+1,) CSR offsets at CELL granularity
    origin: jnp.ndarray      # (3,)
    cell_size: jnp.ndarray   # ()
    bbox_hi: jnp.ndarray     # (3,) true target bbox max corner


def build_pallas_grid(
    target: np.ndarray, resolution: int, trange: int = 2048, dtype=np.float32,
    normals: "np.ndarray | None" = None,
) -> PallasGrid:
    """Host-side build (same CSR structure as ops/cellblock, transposed).

    With ``normals`` (M,3), rows 3-5 of the transposed buffer carry the
    per-point normals so the kernel's one-hot contraction extracts the
    winner's normal for free (point-to-plane mode)."""
    target = np.asarray(target)
    R = resolution
    tmin, tmax = bbox(target)
    cell = max(float((tmax - tmin).max()) / R, 1e-9)

    # int32 cell ids (R ≤ 512 → R³ < 2³¹) sort via radix under
    # kind="stable" — ~3x faster than int64 comparison sort at 1M rows.
    coords = np.clip(((target - tmin) / cell).astype(np.int32), 0, R - 1)
    cid = (coords[:, 0] * R + coords[:, 1]) * R + coords[:, 2]
    order = np.argsort(cid, kind="stable")
    col_start = np.searchsorted(
        cid[order], np.arange(R**2 + 1, dtype=np.int64) * R
    ).astype(np.int32)

    tt = np.full((8, len(target) + trange), _FAR, dtype)
    tt[:3, : len(target)] = target[order].T
    if normals is not None:
        tt[3:6, :] = 0.0
        tt[3:6, : len(target)] = np.asarray(normals)[order].T

    return PallasGrid(
        tgt_t=jnp.asarray(tt),
        col_start=jnp.asarray(col_start),
        origin=jnp.asarray(tmin, dtype),
        cell_size=jnp.asarray(cell, dtype),
        bbox_hi=jnp.asarray(tmax, dtype),
    )


def grouped_tile_order(
    query: np.ndarray,
    grid: PallasGrid,
    resolution: int,
    tile_q: int = 128,
):
    """X-group-aligned query layout: rows + weights for straggler-free tiles.

    The slab-sweep certificate fails structurally for tiles whose query
    bounding box spans more than ``slabs-2`` x-cells — with plain Morton
    tiling the tiles that straddle major Morton-quadrant boundaries span
    half the grid, so ~1-2% of tiles are *permanent* stragglers that pay
    the repair machinery every single iteration. This layout removes them:
    sort queries by target-grid cell id (x-major), then pad each x-row
    group to a multiple of ``tile_q`` by replicating the group's last
    query, so no tile ever crosses an x boundary (x-span ≤ 1 at build
    time, ≤ 2-3 after the source drifts during fine iterations — all well
    inside the slab window).

    Returns (rows, weight): ``rows`` (n_pad,) int32 indexes into ``query``
    (padding rows replicate real rows), ``weight`` (n_pad,) f32 is 1 for
    real rows and 0 for padding — the ICP driver folds it into every
    statistic, so padded rows are invisible to the trajectory.
    """
    q = np.asarray(query)
    R = resolution
    origin = np.asarray(grid.origin, np.float64)
    cell = float(np.asarray(grid.cell_size))
    c = np.clip(((q - origin) / cell).astype(np.int32), 0, R - 1)
    order = np.argsort(
        (c[:, 0] * R + c[:, 1]) * R + c[:, 2], kind="stable"
    )
    xc = c[order, 0]
    counts = np.bincount(xc, minlength=R)

    # Vectorized per-group padding: each x-group of size n_g occupies
    # ceil(n_g/tile_q)·tile_q output rows; real rows scatter to their
    # group's base offset, padding rows pre-fill with the group's last
    # real row.
    n_pad_g = -(-counts // tile_q) * tile_q          # (R,)
    out_base = np.concatenate([[0], np.cumsum(n_pad_g)[:-1]])
    in_base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(n_pad_g.sum())

    rows = np.zeros(total, np.int64)
    weight = np.zeros(total, np.float32)
    nz = counts > 0
    # Fill every row of each group with its last real query (covers the
    # padding tail), then overwrite the real prefix.
    last = np.repeat(order[in_base[nz] + counts[nz] - 1], n_pad_g[nz])
    rows[np.repeat(out_base[nz], n_pad_g[nz])
         + _ranges(n_pad_g[nz])] = last
    src_pos = np.repeat(out_base[nz], counts[nz]) + _ranges(counts[nz])
    rows[src_pos] = order
    weight[src_pos] = 1.0
    return rows, weight


def _ranges(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (vectorized per-group arange)."""
    ends = np.cumsum(lengths)
    total = int(ends[-1]) if len(ends) else 0
    ix = np.arange(total)
    return ix - np.repeat(ends - lengths, lengths)


# auto_trange output is quantized onto this geometric ladder: trange is a
# static arg of the Pallas kernel (and the jitted ICP loop specializes on
# the nn_fn object), so every distinct value is a fresh 1-8 min remote
# compile in this environment. The ladder bounds the number of compiled
# variants at 8 across arbitrarily many datasets while only ever rounding
# UP (more certification margin, and kernel cost is measured sub-linear in
# trange on v5e, so the overshoot is nearly free).
_TRANGE_LADDER = (768, 1024, 1536, 2048, 3072, 4096, 6144, 8192)

# auto_trange estimates its column-count distribution from at most this many
# points (strided subsample above it) — the host pass is O(N) numpy.
_AUTO_TRANGE_SAMPLE_CAP = 2_000_000


def auto_trange(
    target: np.ndarray,
    resolution: int,
    y_window: int = 4,
    floor: int = 768,
    cap: int = 8192,
    population: "int | None" = None,
    tile_q: int = 128,
) -> int:
    """Data-adaptive slab range (rows per slab DMA).

    A slab holds the rows of one x-cell restricted to the tile's dilated
    y-span (~4 cells) over the full z column; rows beyond ``trange`` are
    truncated, which decertifies the tile and sends it to the repair
    path. A fixed trange is therefore a density cliff: one notch too
    small and a denser dataset silently mass-decertifies mid-loop into
    the budgeted-brute safety net at ~40x the iteration cost (measured;
    see make_pallas_nn_device). This estimator sizes trange from the
    target's own distribution instead: mass-weighted p99.9 of the
    (x, 4-consecutive-y) column-count sums — windows host query tiles in
    proportion to the points in them — with a 4/3 margin for mid-loop
    layout aging (the query layout is built at the fine level's starting
    pose; spans grow as ICP moves the source). On the 1M-terrain bench
    workload this reproduces the hand-tuned optimum (1536) exactly.

    ``population``: when ``target`` is itself a strided SAMPLE of a
    larger cloud (streamed-ingest slab estimation, parallel/ingest.py —
    no process ever holds the slab), the true point count; window counts
    are scaled up by population/len(target) so the estimate sizes the
    full slab's rows, not the sample's.
    """
    target = np.asarray(target)
    R = resolution
    tmin, tmax = bbox(target)
    extent = float((tmax - tmin).max()) or 1.0
    cell = max(extent / R, 1e-9)
    pop_scale = (
        1.0 if population is None else population / max(len(target), 1)
    )
    # Above ~2M points, estimate the distribution from a strided subsample
    # (scaled back up): the full-array bincount pass costs hundreds of ms
    # of host time at 10M, and the p99.9 of window sums is insensitive to
    # uniform thinning at this sample size (the 4/3 margin + ladder
    # round-up dwarf the estimator noise).
    stride = max(1, len(target) // _AUTO_TRANGE_SAMPLE_CAP)
    sampled = target[::stride, :2]
    c = np.clip(((sampled - tmin[:2]) / cell).astype(np.int64),
                0, R - 1)
    counts = np.bincount(c[:, 0] * R + c[:, 1], minlength=R * R) * stride
    if pop_scale != 1.0:
        counts = (counts * pop_scale).astype(np.int64)
    counts = counts.reshape(R, R)
    cs = np.concatenate(
        [np.zeros((R, 1), np.int64), np.cumsum(counts, axis=1)], axis=1
    )
    # Occupancy-derived window width (the auto_zrange treatment, ported
    # round 4): a tile's y-span is ~tile_q / (points per occupied
    # (x,y)-cell) cells, and the kernel's per-tile window covers that
    # span ±1 dilation plus drift aging (+3 total — the calibration that
    # reproduces BOTH proven configs: R=64/occ 128 → span 1 → w 4 →
    # trange 1536; boosted R=128/occ 32 → span 4 → w 7 → 768). The old
    # fixed w=4 underestimated boosted-grid windows ~1.6x and only the
    # 768 floor masked it: trange=512 at its apparent 1.6x-over-max
    # margin mass-decertifies mid-loop into a 63x repair storm
    # (measured, tools/exp_trange512.py — true margin was ~1.05x).
    occ_cells = max(int((counts > 0).sum()), 1)
    occ = max(pop_scale * len(sampled) * stride / occ_cells, 1.0)
    span = int(np.ceil(tile_q / occ))
    w = max(min(max(y_window, span + 3), R), 1)
    win = (cs[:, w:] - cs[:, :-w]).reshape(-1)
    mass = win.astype(np.float64)
    total = mass.sum()
    if total <= 0:
        return floor
    order = np.argsort(win)
    cdf = np.cumsum(mass[order]) / total
    p999 = int(win[order][np.searchsorted(cdf, 0.999)])
    tr = int(np.clip(int(p999 * 4 / 3), floor, cap))
    for step in _TRANGE_LADDER:  # quantize up onto the compile-reuse ladder
        if tr <= step:
            return step
    return cap


# Coarse repair-grid row-budget cap. The sweep kernel's chunk loop is
# UNROLLED (static per-chunk widths); Mosaic allocates the (tile_q,
# chunk) working set PER unrolled iteration on the scoped-VMEM stack, so
# usage grows ~1 MB per 2048 rows of trange: 16384 → ~8 MB (proven),
# 65536 → 35 MB (measured compile failure: "scoped allocation 34.97M,
# limit 16.00M" on the volume workload). Raising this requires a
# fori_loop chunk sweep, not just a bigger number.
_COARSE_TRANGE_CAP = 16384


def auto_coarse_trange(target, resolution, *, population=None):
    """Data-adaptive row budget for the COARSE repair grid (round 5).

    The repair stages re-sweep bad tiles against a 4×-coarser grid; the
    budget was fixed at ``_COARSE_TRANGE_CAP`` (the scoped-VMEM compile
    bound) — a safety maximum, and the dominant repair cost: every
    firing pays slabs×trange lanes per tile. ``auto_trange`` measured at
    the coarse resolution sizes it from the target's own window-row
    distribution instead, PLUS ONE LADDER NOTCH of drift margin.

    The notch is measured, not decorative (tools/exp_repair_scan.py, 1M
    point-mode fine loop): the raw auto value (6144) under-budgets the
    AGED repair tiles — point mode slides on this terrain, so the tiles
    reaching repair have wider-than-p99.9 spans — and the overflow
    decertifies at the coarse level into the ~60× brute tier EVERY
    iteration: 27.5 ms/iter vs 21.7 at the old fixed 16384 budget. One
    notch up (8192) keeps the repair certifiable AND halves the firing
    cost: 20.8 ms/iter. Exactness is budget-independent either way (an
    overflowing tile decertifies into brute; the certificate, not the
    budget, carries correctness) — the budget only steers WHICH tier
    pays."""
    tr = auto_trange(target, max(resolution // 4, 8),
                     population=population)
    for step in _TRANGE_LADDER:
        if step > tr:
            return min(step, _COARSE_TRANGE_CAP)
    # auto_trange saturated its own 8192 cap (the ladder top): the notch
    # must still exist — the densest coarse distributions are exactly
    # where aged repair tiles overflow — so double up to the compile
    # bound (the round-4 budget).
    return min(2 * tr, _COARSE_TRANGE_CAP)

_ZRANGE_LADDER = (256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)


def auto_zrange(
    target: np.ndarray,
    resolution: int,
    tile_q: int = 128,
    floor: int = 256,
    cap: int = 4096,
    population: "int | None" = None,
) -> int:
    """Data-adaptive z-window row budget for the column kernel
    (``nn_colsweep_z``) — the z-axis analog of ``auto_trange``:
    mass-weighted p99.9 of per-(x,y)-column w-consecutive-cell count
    sums, with a 4/3 margin for mid-loop layout aging, quantized up onto
    a compile-reuse ladder. Cells are ANISOTROPIC (per-axis extent/R),
    matching the zcol grid build — cubic cells would leave a flat-box
    cloud only a handful of occupied z-cells, making z-windows unable to
    shrink below the slab itself.

    The window width w is sized from the data: a tile's z-span is
    ~tile_q / (points per occupied cell) cells, and the actual kernel
    window is that span dilated by ±1 plus drift aging — measured on the
    1M 'uniform' bench slab, a fixed w=5 undersized the budget (384) and
    mass-decertified into a 19x repair storm, while the occupancy-derived
    w=9 → 512 holds certification (the same cliff auto_trange exists to
    remove on the x axis)."""
    target = np.asarray(target)
    R = resolution
    tmin, tmax = bbox(target)
    cell = np.maximum((tmax - tmin) / R, 1e-9)
    pop = population if population is not None else len(target)
    pop_scale = pop / max(len(target), 1)
    stride = max(1, len(target) // _AUTO_TRANGE_SAMPLE_CAP)
    sampled = target[::stride]
    c = np.clip(((sampled - tmin) / cell).astype(np.int64), 0, R - 1)
    cid = (c[:, 0] * R + c[:, 1]) * R + c[:, 2]
    counts = (np.bincount(cid, minlength=R**3) * stride).reshape(R * R, R)
    if pop_scale != 1.0:
        counts = (counts * pop_scale).astype(np.int64)
    occ_cells = max(int((counts > 0).sum()), 1)
    occ = max(pop / occ_cells, 1.0)   # points per occupied cell
    span = int(np.ceil(tile_q / occ))          # expected tile z-span
    z_window = span + 4                        # ±1 dilation + aging margin
    cs = np.concatenate(
        [np.zeros((R * R, 1), np.int64), np.cumsum(counts, axis=1)], axis=1
    )
    w = max(min(z_window, R), 1)
    win = (cs[:, w:] - cs[:, :-w]).reshape(-1)
    mass = win.astype(np.float64)
    total = mass.sum()
    if total <= 0:
        return floor
    order = np.argsort(win)
    cdf = np.cumsum(mass[order]) / total
    p999 = int(win[order][np.searchsorted(cdf, 0.999)])
    zr = int(np.clip(int(p999 * 4 / 3), floor, cap))
    for step in _ZRANGE_LADDER:
        if zr <= step:
            return step
    return cap


# ---------------------------------------------------------------------------
# Device-side factory. The host builds above exist for CPU-testable
# reference behavior and the normals (point-to-plane) path; the driver's
# default pallas route builds everything on-accelerator instead, because
# on this class of host the numpy sorts plus the ~50 MB of grid uploads
# cost ~1.8 s per registration while the same work on-device is tens of
# milliseconds riding the single 12 MB target upload the ICP loop needs
# anyway.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("resolution", "trange",
                                              "mask_far"))
def _build_grid_dev(target, origin, cell_size, *, resolution: int,
                    trange: int, normals=None, mask_far: bool = False):
    """On-device equivalent of ``build_pallas_grid``.

    Same CSR layout and _FAR padding; jnp.argsort is stable like the
    host's kind="stable", so tie order within a cell matches bit-for-bit.
    With ``normals`` (M,3), rows 3-5 carry the per-point normals (the
    kernel extracts the winner's normal for free — point-to-plane).

    ``mask_far=True`` treats input rows at the _FAR padding coordinate as
    non-points: they sort AFTER every real cell (cell id R³) so they pad
    the tail like the trange rows instead of polluting the corner cell's
    CSR ranges. Used by the partitioned-target path, whose fixed-shape
    per-device slabs are _FAR-padded on host (parallel/partition.py)."""
    R = resolution
    tgt = target.astype(jnp.float32)
    org = origin.astype(jnp.float32)
    cs = cell_size.astype(jnp.float32)
    coords = jnp.clip(((tgt - org[None, :]) / cs).astype(jnp.int32), 0, R - 1)
    cid = (coords[:, 0] * R + coords[:, 1]) * R + coords[:, 2]
    if mask_far:
        cid = jnp.where(tgt[:, 0] >= _FAR * 0.5, R * R * R, cid)
    # Multi-operand stable sort carries the coordinate (and normal)
    # columns as payloads — the argsort formulation costs two extra
    # 1M-row gathers afterwards (cid[order], tgt[order]) at ~30 ns/row.
    ops = [cid, tgt[:, 0], tgt[:, 1], tgt[:, 2]]
    if normals is not None:
        nf = normals.astype(jnp.float32)
        ops += [nf[:, 0], nf[:, 1], nf[:, 2]]
    sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=True)
    cid_sorted = sorted_ops[0]
    col_start = jnp.searchsorted(
        cid_sorted, jnp.arange(R ** 2 + 1, dtype=jnp.int32) * R
    ).astype(jnp.int32)

    top = jnp.concatenate(
        [jnp.stack(sorted_ops[1:4]),
         jnp.full((3, trange), _FAR, jnp.float32)], axis=1
    )
    m = tgt.shape[0]
    if normals is not None:
        nrows = jnp.concatenate(
            [jnp.stack(sorted_ops[4:7]),
             jnp.zeros((3, trange), jnp.float32)], axis=1
        )
        tt = jnp.concatenate(
            [top, nrows, jnp.full((2, m + trange), _FAR, jnp.float32)],
            axis=0,
        )
    else:
        tt = jnp.concatenate(
            [top, jnp.full((5, m + trange), _FAR, jnp.float32)], axis=0
        )
    real = (tgt[:, 0] < _FAR * 0.5)[:, None]
    hi3 = jnp.max(
        jnp.where(real, tgt, jnp.asarray(-_FAR, jnp.float32)), axis=0
    )
    return PallasGrid(tgt_t=tt, col_start=col_start, origin=org,
                      cell_size=cs, bbox_hi=hi3)


@functools.partial(
    jax.jit,
    static_argnames=(
        "resolution", "trange", "coarse_resolution", "coarse_trange",
    ),
)
def _build_grids_dev(
    target_dev, origin, cell, cell_c, normals=None, *,
    resolution: int, trange: int, coarse_resolution: int, coarse_trange: int,
):
    """Fine + coarse grid levels built in one compiled dispatch."""
    fine = _build_grid_dev(
        target_dev, origin, cell, resolution=resolution, trange=trange,
        normals=normals,
    )
    coarse = _build_grid_dev(
        target_dev, origin, cell_c, resolution=coarse_resolution,
        trange=coarse_trange, normals=normals,
    )
    return fine, coarse


@functools.partial(
    jax.jit,
    static_argnames=(
        "resolution", "zrange", "coarse_resolution", "coarse_trange",
    ),
)
def _build_zgrids_dev(
    target_dev, origin, cell, cell_c, normals=None, *,
    resolution: int, zrange: int, coarse_resolution: int, coarse_trange: int,
):
    """Z-column fine grid + x-sweep coarse repair grid, one dispatch."""
    fine = _build_zgrid_dev(
        target_dev, origin, cell, resolution=resolution, zrange=zrange,
        normals=normals,
    )
    coarse = _build_grid_dev(
        target_dev, origin, cell_c, resolution=coarse_resolution,
        trange=coarse_trange, normals=normals,
    )
    return fine, coarse


@functools.partial(jax.jit, static_argnames=("resolution", "tile_q",
                                              "group", "with_coords"))
def grouped_tile_order_device(
    query, origin, cell_size, *, resolution: int, tile_q: int = 128,
    group: str = "x", with_coords: bool = False, coords=None,
):
    """On-device ``grouped_tile_order`` with a static output length.

    The host version's output length is data-dependent (sum of per-group
    pads); under jit the layout is instead built at the worst-case static
    length ``n`` + G·(tile_q−1) rounded up to a tile multiple, as a pure
    gather (no scatters): output row j belongs to group g =
    searchsorted(out_end, j); its in-group offset r indexes the group's
    real run when r < count, else replicates the group's last real row.
    Rows past the last group's pad replicate one real query with weight 0
    (a singleton-bbox tile — certifies trivially, costs one slab).

    ``group``: "x" aligns tiles to x-cell groups (G=R — the slab-sweep
    kernel's requirement); "xy" aligns to (x,y)-cell pairs (G=R² — the
    z-window column kernel's requirement: a tile then spans ONE column at
    build time, so its z-span stays a few cells). "xy" is meant for the
    volume regime's small resolutions — its worst-case padding grows
    with R².
    """
    n = query.shape[0]
    R = resolution
    G = R if group == "x" else R * R
    total = -(-(n + G * (tile_q - 1)) // tile_q) * tile_q
    q = query.astype(jnp.float32)
    org = origin.astype(jnp.float32)
    cs = cell_size.astype(jnp.float32)
    c = jnp.clip(((q - org[None, :]) / cs).astype(jnp.int32), 0, R - 1)
    cid = (c[:, 0] * R + c[:, 1]) * R + c[:, 2]
    gq = c[:, 0] if group == "x" else c[:, 0] * R + c[:, 1]
    # One stable sort carrying (row index, group id) as payloads — the
    # argsort + gather formulation pays an extra ~30 ns/row gather.
    # ``with_coords=True`` additionally carries coordinates as sort
    # payloads and emits the ROW-ORDERED coordinates from the same
    # single output gather as ``rows`` (bitcast into a 4th column):
    # XLA row-gathers cost ~30 ns/row INDEPENDENT of width, so fusing
    # the caller's ``query[rows]`` into this one saves a full 1M-row
    # gather (~30 ms at 1M — measured bulk of the fine/prep stage).
    # ``coords`` (optional) substitutes the payload coordinates: the
    # two-stage fine level keys the layout by the CURRENT pose but
    # needs the RAW source reordered (the loop carry holds the pose).
    ops = [cid, jnp.arange(n, dtype=jnp.int32), gq]
    if with_coords:
        cq = q if coords is None else coords.astype(jnp.float32)
        ops += [cq[:, 0], cq[:, 1], cq[:, 2]]
        _, order, xc, sx, sy, sz = jax.lax.sort(
            ops, dimension=0, num_keys=1, is_stable=True,
        )
    else:
        _, order, xc = jax.lax.sort(
            ops, dimension=0, num_keys=1, is_stable=True,
        )  # xc sorted (cid is x-major, then y)
    bounds = jnp.searchsorted(xc, jnp.arange(G + 1, dtype=jnp.int32))
    counts = bounds[1:] - bounds[:-1]
    in_base = bounds[:-1]
    n_pad_g = ((counts + tile_q - 1) // tile_q) * tile_q
    out_end = jnp.cumsum(n_pad_g)
    out_base = out_end - n_pad_g

    j = jnp.arange(total, dtype=jnp.int32)
    # searchsorted(out_end, j, 'right') with only R boundaries: the
    # broadcast compare+sum is pure VPU work, where searchsorted lowers to
    # a per-row binary-search gather loop (~30 ns/row — ms at 1M rows).
    g = jnp.sum(
        j[:, None] >= out_end[None, :].astype(jnp.int32), axis=1
    ).astype(jnp.int32)
    g_cl = jnp.clip(g, 0, G - 1)
    r = j - out_base[g_cl]
    cnt = counts[g_cl]
    real = (g < G) & (r < cnt)
    idx = jnp.clip(
        in_base[g_cl] + jnp.minimum(r, jnp.maximum(cnt - 1, 0)), 0, n - 1
    )
    weight = real.astype(jnp.float32)
    if with_coords:
        payload = jnp.stack(
            [jax.lax.bitcast_convert_type(order, jnp.float32), sx, sy, sz],
            axis=1,
        )
        out = payload[idx]  # ONE row gather for rows + coords
        rows = jax.lax.bitcast_convert_type(out[:, 0], jnp.int32)
        return rows, weight, out[:, 1:4]
    rows = order[idx].astype(jnp.int32)
    return rows, weight


def resolve_slab_grid_params(
    slab_samples,
    *,
    n_dev: int,
    n_queries: int,
    grid_resolution: "int | None" = None,
    fine_kernel: str = "auto",
    populations=None,
):
    """Shared static grid-parameter resolution for the partitioned paths.

    ``parallel.partition.prepare_partition`` (host slab arrays) and
    ``parallel.ingest.estimate_partition_grid_params`` (strided file
    samples with ``populations`` carrying true per-slab counts) MUST
    pick identical kernels and budgets from equivalent data — this is
    the single copy of the ladder quantization and the zcol cost-model
    gate (which folds in the per-device (x,y)-layout padding inflation).
    Returns dict(resolution, trange, coarse_trange, fine_kernel).
    """
    pops = populations if populations is not None else [None] * len(
        slab_samples
    )
    if grid_resolution:
        resolution = normals_resolution = grid_resolution
    else:
        # Shared UNBOOSTED base first: per-slab bases combined with max()
        # (every slab runs the same compiled kernel shape). The surface
        # boost is decided below, after the zcol gate, and only if EVERY
        # slab's own occupancy at the boosted R clears the safe edge — a
        # dense slab must not force a boosted R onto sparser slabs whose
        # gate refused it (their ladder handoff would land outside the
        # fine cell size: measured collapses at 21 and 8 pts/cell,
        # tools/exp_res_retune.py).
        from iterativeclosestpoint_tpu.ops.cellblock import (
            _occupancy_model,
        )

        models = [_occupancy_model(np.asarray(s)) for s in slab_samples]
        resolution = normals_resolution = max(
            auto_resolution_data(s, population=p, model=m)
            for s, p, m in zip(slab_samples, pops, models)
        )

    def _trange_at(r):
        tr = max(
            auto_trange(s, r, population=p)
            for s, p in zip(slab_samples, pops)
        )
        for step in _TRANGE_LADDER:
            if tr <= step:
                return step
        return tr

    trange = _trange_at(resolution)
    out_kernel = "sweep"
    # zcol gate at the UNBOOSTED base parameters (the boost is
    # surface-regime-only; a boosted R must not disqualify the switch).
    if fine_kernel == "zcol" or (
        fine_kernel == "auto" and trange >= 2048 and resolution <= 128
    ):
        zr = max(
            auto_zrange(s, resolution, population=p)
            for s, p in zip(slab_samples, pops)
        )
        q_per_dev = max(n_queries // max(n_dev, 1), 1)
        pad = 1.0 + (resolution**2 * (128 - 1) / 2) / q_per_dev
        if fine_kernel == "zcol" or 12 * zr * pad < 0.7 * 4 * trange:
            out_kernel = "zcol"
            trange = zr  # the exact chain reuses trange as the z budget
    if out_kernel == "sweep" and not grid_resolution:
        from iterativeclosestpoint_tpu.ops.cellblock import surface_boost_ok

        if all(
            surface_boost_ok(s, 2 * resolution, population=p, model=m)
            for s, p, m in zip(slab_samples, pops, models)
        ):
            resolution = 2 * resolution
            trange = _trange_at(resolution)
    coarse_tr = max(
        auto_coarse_trange(s, resolution, population=p)
        for s, p in zip(slab_samples, pops)
    )
    return dict(
        resolution=int(resolution), trange=int(trange),
        coarse_trange=int(coarse_tr), fine_kernel=out_kernel,
        normals_resolution=int(normals_resolution),
    )


def estimate_grid_params(target_local, resolution=None):
    """The host-side estimator passes of make_pallas_nn_device, split out
    so callers can run them EARLY (they cost ~150 ms at 1M and are pure
    numpy — the multiscale pipeline runs them while the big uploads ride
    the tunnel, then hands the result back via ``est=``). Returns
    (resolution, trange_est, coarse_trange, normals_resolution, zrange
    — the z-window budget, precomputed only in the zcol regime, else
    None) —
    ``resolution`` carries the fused-kernel surface boost
    (auto_resolution_data(surface_boost_occupancy=32), round 4);
    ``normals_resolution`` is the unboosted base for cell-PCA sizing.

    The boost is surface-regime-only: when the UNBOOSTED base parameters
    land in the zcol kernel's candidate regime (base trange ≥ 2048 at
    base R ≤ 128 — quasi-volumetric clouds up to the boost's d ≤ 2.45
    box-dimension gate), the FULL zcol cost model is evaluated here at
    the base parameters (same inequality as make_pallas_nn_device's
    auto gate, at its default slabs=4/tile_q=128). If zcol wins, the
    base numbers plus the precomputed zrange are returned; if the cost
    model rejects zcol (its candidate count does not undercut the
    sweep's), the cloud is a sweep cloud after all and the boost is
    reconsidered — matching resolve_slab_grid_params, which orders the
    decisions the same way on the partitioned paths."""
    target_local = np.asarray(target_local)
    from iterativeclosestpoint_tpu.ops.cellblock import (
        _occupancy_model,
        auto_resolution_data,
        surface_boost_ok,
    )

    zrange = None
    if resolution is not None:
        R = base = resolution
        tr = auto_trange(target_local, R)
    else:
        # One occupancy-probe pass (O(N) cellize) shared by the
        # resolution pick and the boost gates below.
        model = _occupancy_model(target_local)
        R, base = auto_resolution_data(
            target_local, surface_boost_occupancy=32, return_base=True,
            model=model,
        )
        tr_base = auto_trange(target_local, base)
        tr = tr_base
        boosted = R != base
        if tr_base >= 2048 and base <= 128:
            boosted = False
            R = base
            # Precompute the z-window budget here (the zcol gate and
            # grid build in make_pallas_nn_device otherwise run this
            # ~40 ms host pass TWICE on the coarse→fine critical path —
            # this stage rides under the bulk uploads instead).
            zrange = auto_zrange(target_local, base)
            pad = 1.0 + (base**2 * (128 - 1) / 2) / max(
                len(target_local), 1
            )
            if not (12 * zrange * pad < 0.7 * 4 * tr_base):
                # zcol loses its own cost model: sweep cloud after all —
                # the boost gets its normal chance. ``zrange`` stays in
                # the tuple (make_pallas_nn_device's gate re-evaluates
                # the same inequality from it without a fresh host pass
                # when the boost is occupancy-refused here).
                boosted = surface_boost_ok(
                    target_local, 2 * base, model=model
                )
                R = 2 * base if boosted else base
        if boosted:
            tr = auto_trange(target_local, R)
    return (R, tr, auto_coarse_trange(target_local, R), base, zrange)


def make_pallas_nn_device(
    target_local: np.ndarray,
    resolution: int | None = None,
    trange: "int | None" = None,
    slabs: int = 4,
    target_dev=None,
    tile_q: int = 128,
    with_normals: bool = False,
    kernel: str = "auto",
    est: "tuple | None" = None,
):
    """Device-built twin of ``make_pallas_nn``.

    ``with_normals=True`` estimates target normals on device (cell PCA,
    ops/normals.estimate_normals_cellpca_device) and packs them into the
    grids — the point-to-plane contract without a host rebuild or the
    2x full-grid re-upload.

    Host work is a single bbox sweep (origin/cell must be static-free
    scalars for the grid geometry); both grid levels are sorted, gathered
    and padded on-accelerator from ``target_dev`` (reusing the upload the
    ICP driver performs anyway).

    ``tile_q``: keep 128. 256 measures ~10% faster standalone
    (29.7 vs 33.0 ms/call at 1M, trange=1536) but the doubled per-tile
    y-span pushes slab row ranges over the trange cap once the source
    drifts mid-loop — mass decertification, repair storm, 263 ms/iter.
    trange=2048 restores certification but costs more than it saves.

    ``trange``: default None = data-adaptive (``auto_trange``), which
    reproduces 1536 on the 1M-terrain bench workload. Why adaptivity
    matters: the slab-window row-count distribution at 1M (R=64 terrain)
    is p50=790 / p99.9=1064 / max=1453; the fit margin is trange-128,
    so 1536 (margin 1408) holds through mid-loop layout aging
    — the query layout is built at the fine level's starting pose, and
    as ICP moves the source the per-tile spans (hence window rows) GROW.
    One notch down (1280, margin 1152) certifies 99.95% at the start yet
    mass-decertifies mid-loop: the staged repair budget overflows into
    the budgeted-brute safety net and iterations go 40x slower (measured
    1.6 s/iter; results stay exact — that is the safety net working as
    designed, just slowly). Kernel cost is also sub-linear in trange on
    v5e (1280 measured SLOWER than 1536 standalone: 34.3 vs 33.5 ms at
    1M), so shrinking the sweep buys nothing even when it certifies.
    jnp.argmin inside the kernel is ~half the kernel time but a
    hand-rolled eq+masked-iota+min replacement measured the same
    (Mosaic's lowering is already that), and issuing all slab DMAs
    upfront instead of double-buffering measured identical too — the
    kernel sits at the VPU roofline for its pass structure."""
    target_local = np.asarray(target_local)
    coarse_trange = None
    normals_resolution = resolution  # user-forced R sizes normals too
    est_zrange = None
    if est is not None and resolution is None and trange is None:
        # Precomputed estimator results (estimate_grid_params): same
        # numbers, same kernel-gate semantics, host passes skipped.
        # 4-tuples (older callers) lack the precomputed zrange.
        (resolution, trange_est, coarse_trange, normals_resolution,
         *_rest) = est
        est_zrange = _rest[0] if _rest else None
    elif resolution is None and trange is None:
        # Full auto: one copy of the boost/zcol-regime ordering
        # (estimate_grid_params — the boost is refused when the UNBOOSTED
        # base parameters land in the zcol candidate regime, so the
        # auto-kernel gate below sees the same numbers it did pre-boost).
        (resolution, trange_est, coarse_trange, normals_resolution,
         est_zrange) = estimate_grid_params(target_local)
    else:
        if resolution is None:
            # Surface-boosted NN resolution (fused-kernel re-tune); the
            # unboosted base sizes the cell-PCA normals below (a boosted
            # PCA cell would quarter the points per cell).
            resolution, normals_resolution = auto_resolution_data(
                target_local, surface_boost_occupancy=32, return_base=True
            )
        trange_est = (
            trange if trange is not None
            else auto_trange(target_local, resolution)
        )
    # Kernel regime selection: the x-slab sweep is shaped for scan
    # surfaces (z ≈ f(x,y) — full-z columns are nearly all window). When
    # the data-adaptive slab range blows past the surface regime (volume
    # clouds: full-z columns sweep 4-16x too many rows), switch to the
    # z-window column kernel, whose per-(x,y) short DMAs track the tile's
    # own z-span through the full R³ CSR — but only when its candidate
    # count (12 slots × zrange) actually undercuts the sweep's
    # (slabs × trange): an undersized budget is a certification cliff,
    # an oversized one is slower than the sweep it replaces.
    zrange = None
    if kernel == "auto":
        kernel = "sweep"
        if trange is None and trange_est >= 2048 and resolution <= 128:
            zr_est = (
                est_zrange if est_zrange is not None
                else auto_zrange(target_local, resolution, tile_q=tile_q)
            )
            # Effective zcol cost includes the (x,y)-group layout's query
            # padding (each of the R² groups pads to a tile multiple).
            pad = 1.0 + (resolution**2 * (tile_q - 1) / 2) / max(
                len(target_local), 1
            )
            if 12 * zr_est * pad < 0.7 * slabs * trange_est:
                kernel = "zcol"
                zrange = zr_est
    trange = trange_est
    if kernel == "zcol" and zrange is None:
        zrange = (
            est_zrange if est_zrange is not None
            else auto_zrange(target_local, resolution, tile_q=tile_q)
        )
    tmin, tmax = bbox(target_local)
    if target_dev is None:
        target_dev = jnp.asarray(target_local, jnp.float32)

    normals_dev = None
    if with_normals:
        from iterativeclosestpoint_tpu.ops.normals import (
            estimate_normals_cellpca_device,
        )

        nr = normals_resolution or resolution
        cell0 = max(float((tmax - tmin).max()) / nr, 1e-9)
        normals_dev = estimate_normals_cellpca_device(
            target_dev, jnp.asarray(tmin, jnp.float32),
            jnp.asarray(cell0, jnp.float32), resolution=nr,
        )

    coarse_resolution = max(resolution // 4, 8)
    if coarse_trange is None:
        # Fixed at the proven scoped-VMEM bound (see _COARSE_TRANGE_CAP:
        # the kernel's unrolled chunk loop makes larger budgets fail to
        # COMPILE). Dense slabs whose 4-coarse-cell windows exceed this
        # fall through to the budgeted brute tier — the multi-pass
        # coarse staging + out-of-coverage certificates keep that rare.
        coarse_trange = _COARSE_TRANGE_CAP
    ext = float((tmax - tmin).max())
    # Both levels in ONE jitted dispatch: fuses the elementwise prep and
    # halves the dispatch round-trips (measured 11.1 ms fused vs 16.4 ms
    # as two eager builds at 1M points).
    if kernel == "zcol":
        # Anisotropic cells: per-axis extent/R (see auto_zrange — cubic
        # cells starve flat-box clouds of z resolution).
        cell3 = np.maximum((tmax - tmin) / resolution, 1e-9)
        grid, coarse = _build_zgrids_dev(
            target_dev,
            jnp.asarray(tmin, jnp.float32),
            jnp.asarray(cell3, jnp.float32),
            jnp.asarray(max(ext / coarse_resolution, 1e-9), jnp.float32),
            normals_dev,
            resolution=resolution,
            zrange=zrange,
            coarse_resolution=coarse_resolution,
            coarse_trange=coarse_trange,
        )
        trange = zrange  # the exact chain reuses trange as the z budget
    else:
        grid, coarse = _build_grids_dev(
            target_dev,
            jnp.asarray(tmin, jnp.float32),
            jnp.asarray(max(ext / resolution, 1e-9), jnp.float32),
            jnp.asarray(max(ext / coarse_resolution, 1e-9), jnp.float32),
            normals_dev,
            resolution=resolution,
            trange=trange,
            coarse_resolution=coarse_resolution,
            coarse_trange=coarse_trange,
        )
    global_fallback = len(target_local) <= 300_000
    state = (
        grid, coarse,
        normals_dev if with_normals else jnp.zeros((0,)),
    )
    return (
        _pallas_fn(resolution, coarse_resolution, trange, coarse_trange,
                   global_fallback, with_normals, slabs=slabs,
                   tile_q=tile_q, fine=kernel),
        state,
        resolution,
    )


def make_pallas_brute(
    target_local: np.ndarray,
    dtype=np.float32,
    normals: "np.ndarray | None" = None,
):
    """All-pairs exact 1-NN through the slab-sweep kernel (R=1 grid).

    TPU-native brute force: a single degenerate grid cell makes every
    query tile's one slab span the whole row-ordered target, which the
    kernel sweeps from VMEM in lane chunks — no (n, m, 3) difference
    tensor (the XLA explicit-difference form in ops.bruteforce
    materializes ~50 MB per 2048x2048 chunk and is HBM-bound: profiled
    266 ms for 15 coarse ICP iterations at 30k^2 vs ~60 ms here).

    Results and tie order match ops.bruteforce.nn_bruteforce exactly:
    the stable sort of a single cell preserves row order, the kernel's
    chunk scan takes the first minimum, and d2 uses the same explicit
    difference form. With ``normals`` (M,3) the adapter returns
    (matched, dist, normal) — the point-to-plane contract.

    Only valid for m <= ~128k (the slab must fit VMEM); callers above
    that use the real grid. 1-NN semantics of core/octree.cpp:175-184.
    """
    target_local = np.asarray(target_local)
    m = len(target_local)
    trange = max(-(-m // 128) * 128, 128)
    if trange > 131072:
        raise ValueError(f"pallas brute limited to m<=131072, got {m}")
    grid = build_pallas_grid(
        target_local, resolution=1, trange=trange, dtype=np.float32,
        normals=normals,
    )
    return _brute_fn(trange, normals is not None), grid


@functools.lru_cache(maxsize=None)
def _brute_fn(trange: int, with_normals: bool):
    # Module-level cache: the ICP driver jit-specializes on the nn_fn
    # OBJECT (static arg), so the adapter must be one function per
    # (trange, normals) — a fresh closure per registration would
    # recompile the whole loop every call.
    def fn(query, target, nn_state):
        del target
        matched, nrm, dist, _cert = nn_colsweep(
            query, nn_state, resolution=1, slabs=1, trange=trange,
            first_tie=True,
        )
        if with_normals:
            return matched, dist, nrm
        return matched, dist

    return fn


def use_fused_sweep(slabs: int, trange: int) -> bool:
    """Production gate for the fused-buffer sweep form (round 4): at
    sub-2048 tranges the slot-wise chunk loop pays per-chunk fixed costs
    (strip edges at R=128/trange=768 measured 12.3 → 10.1 ms fused);
    trange ≥ 1536 is neutral (chunks already run near full width), and
    slabs·trange beyond ~24576 lanes fails to COMPILE (the fused form's
    unrolled-chunk scoped-VMEM bound). Single copy — the production
    dispatch (nn_colsweep_exact) and bench.py's standalone kernel timing
    MUST stay on the same form."""
    return slabs > 1 and trange < 1536 and slabs * trange <= 24576


def fused_sweep_chunk(slabs: int, trange: int) -> int:
    """Chunk width for the fused-buffer form: ONE full-width chunk when
    the whole fused buffer fits the unrolled-chunk working set
    (slabs·trange ≤ 4096 lanes — the (tile_q, chunk) d²/one-hot arrays
    stay ≤ 2 MB of scoped VMEM). Round-5 measurement on the 1M boosted
    shape (R=128, trange=768, slabs=4 → 3072 lanes): the default 2048
    chunking splits it 2048+1024 and pays the per-chunk fixed cost
    (min/update bookkeeping, extraction-dot issue) twice, the second
    time at half width — 16.6 ms vs 15.2 ms single-chunk (+9%),
    bit-exact output. Single copy for the production dispatch and
    bench.py's standalone timing."""
    total = slabs * trange
    return total if total <= 4096 else 2048


def _colsweep_kernel(slabs: int, trange: int, tile_q: int, chunk: int = 2048,
                     first_tie: bool = False):
    """Kernel factory. Each slab is processed in lane-chunks of ``chunk``
    so the (tile_q × chunk) distance/one-hot working set stays ~2 MB of
    VMEM even for long coarse-grid ranges.

    ``first_tie=False`` (default): the winner's one-hot comes from a
    d²-equality compare against the chunk min — NO argmin. The cross-lane
    argmin was the single most expensive phase of the kernel (measured
    15.4 ms/call at 1M pts vs 1.3 ms for the plain min it replaces).
    Exactly-tied candidates make the "one-hot" multi-hot; a tie-count
    column riding the SAME extraction dot (output dim 128-wide — a 19th
    column is free) detects that, and tied queries simply DECERTIFY
    (out row 7 ≠ 1): the repair chain resolves them by XLA brute force,
    which preserves the reference's first-tie order. Real (noisy) data
    has no exact f32 d² ties; degenerate clouds (duplicated points,
    symmetric lattices) route through repair and stay exact.

    ``first_tie=True``: the original argmin form — in-kernel first-tie
    selection for the brute adapter (make_pallas_brute), whose callers
    use results without certification.

    (A per-chunk predicated variant — skip DMA+compute for chunks past the
    slab's end — was measured SLOWER on v5e: 260 ms vs 184 ms at 1M pts,
    R=64; the branchy control flow and per-chunk argmin/one-hot overhead
    outweigh the skipped work. Wide unconditional sweeps win.)
    """
    chunk = min(chunk, trange)
    n_chunks = -(-trange // chunk)

    def kernel(base_ref, q_ref, tgt_ref, out_ref, cand, sems):
        i = pl.program_id(0)
        big = _BIG  # python literal — not a captured tracer

        # Scalar-prefetch metadata is flattened to 1-D (t·slabs,) — 2-D
        # SMEM arrays are lane-padded to 128 and blow the 1 MB SMEM budget.
        def get_dma(slot, s):
            b = pl.multiple_of(base_ref[i * slabs + s], 128)  # 128-aligned
            return pltpu.make_async_copy(
                tgt_ref.at[:, pl.ds(b, trange)],
                cand.at[slot],
                sems.at[slot],
            )

        get_dma(0, 0).start()

        qx = q_ref[0, 0, :]  # (tile_q,)
        qy = q_ref[0, 1, :]
        qz = q_ref[0, 2, :]

        best_d2 = jnp.full((tile_q,), big, jnp.float32)
        best_xyz = jnp.zeros((tile_q, 6), jnp.float32)
        best_cnt = jnp.ones((tile_q,), jnp.float32)

        for s in range(slabs):
            slot = s % 2
            if s + 1 < slabs:
                get_dma((s + 1) % 2, s + 1).start()
            get_dma(slot, s).wait()

            for k in range(n_chunks):
                # Static per-chunk width: the tail chunk may be shorter
                # when trange is not a chunk multiple (any 128-multiple
                # width is lane-legal).
                w = min(chunk, trange - k * chunk)
                c = cand[slot, :, k * chunk : k * chunk + w]  # (8, w)
                # No row-validity mask: every row in [b, b+trange) is
                # either a real target point (possibly outside the
                # certified window — a SUPERSET of candidates still yields
                # the exact NN whenever the certificate holds, and can
                # only lower d² otherwise) or _FAR padding that never
                # wins. This keeps the inner loop at 9 VPU ops/pair.
                d2 = (
                    (qx[:, None] - c[0, :][None, :]) ** 2
                    + (qy[:, None] - c[1, :][None, :]) ** 2
                    + (qz[:, None] - c[2, :][None, :]) ** 2
                )
                dmin = jnp.min(d2, axis=1)
                if first_tie:
                    j = jnp.argmin(d2, axis=1)  # (tile_q,)
                    oh_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (tile_q, w), 1
                    )
                    onehot = (oh_iota == j[:, None]).astype(jnp.float32)
                else:
                    # Equality one-hot: exact because the compare uses the
                    # very d2 values the min ran over. Multi-hot on exact
                    # ties — counted below and decertified.
                    onehot = (d2 == dmin[:, None]).astype(jnp.float32)
                # Winner coordinates (and, rows 3-5, the winner's normal
                # when the grid packs normals) via one-hot MXU
                # contraction — no gather. The contraction must be EXACT
                # in f32 (matched coordinates feed the pose solve), but
                # Precision.HIGHEST costs 6 MXU passes and the ICP driver
                # traces everything under default_matmul_precision
                # ("highest") — measured +42 ms/call at 1M pts. Instead:
                # split the candidate rows into three bf16-exact terms
                # (disjoint 8-bit mantissa windows: hi, mid, lo) and do
                # three DEFAULT (1-pass) dots. A one-hot row selects a
                # single bf16-exact term per dot (f32 accumulate, no
                # rounding), and hi+mid+lo reassembles the f32
                # coordinate bit-for-bit at half the HIGHEST cost.
                # (Precision.HIGH is NOT enough: its 2-term operand
                # split keeps 16 mantissa bits, ~0.2 mm at local scale.)
                c6 = c[0:6, :]
                c_hi = c6.astype(jnp.bfloat16).astype(jnp.float32)
                r1 = c6 - c_hi
                c_mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
                c_lo = r1 - c_mid
                # All three terms ride ONE dot: the MXU output dim is 128
                # wide, so 18 columns costs the same pass as 6 — the
                # per-dot overhead dominated the extraction (3 dots
                # measured ~8 ms/call each at 1M pts). The 19th column
                # (all-ones → hit count; bf16-exact) is free too.
                c3 = jnp.concatenate(
                    [c_hi, c_mid, c_lo, jnp.ones((1, w), jnp.float32)],
                    axis=0,
                )  # (19, chunk)
                ext = jax.lax.dot_general(
                    onehot, c3, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (tile_q, 19)
                coords = ext[:, 0:6] + ext[:, 6:12] + ext[:, 12:18]
                take = dmin < best_d2
                best_d2 = jnp.where(take, dmin, best_d2)
                best_xyz = jnp.where(take[:, None], coords, best_xyz)
                best_cnt = jnp.where(take, ext[:, 18], best_cnt)

        # Single (8, tile_q) output block: rows 0-2 = matched xyz,
        # rows 3-5 = matched normal (zero unless packed), row 6 = d²,
        # row 7 = winning-chunk hit count (1 ⇔ unique winner; first_tie
        # mode emits exactly 1 by construction).
        out_ref[0, 0:6, :] = best_xyz.T
        out_ref[0, 6, :] = best_d2
        out_ref[0, 7, :] = best_cnt

    return kernel


def _colsweep_fused_kernel(slabs: int, trange: int, tile_q: int,
                           chunk: int = 2048, first_tie: bool = False):
    """Fused-buffer variant of ``_colsweep_kernel`` for MANY SHORT slabs
    (the z-column volume kernel's shape: 12 slot DMAs of a few hundred
    rows each).

    Round-4 W1 finding (tools/exp_zsweep.py, measured on the 1M uniform
    workload): the slot-wise kernel runs its chunk loop at the slab
    width — 512-lane chunks at zrange=512 — and per-chunk fixed costs
    (DMA wait, per-dot issue overhead, min/update bookkeeping) eat ~55%
    of the pass: 140G pair/s vs the sweep kernel's 306G pair/s at
    2048-wide chunks, with near-LINEAR time-in-slots scaling (12→9
    slots: −20.6%), i.e. overhead-per-chunk-bound, not DMA-latency
    bound. Here all ``slabs`` copies land in ONE contiguous
    (8, slabs·trange) VMEM buffer (slot s at lane offset s·trange —
    trange is a 128-multiple, so offsets stay DMA-aligned) and the chunk
    loop runs at the full ``chunk`` width across slot boundaries; a
    static schedule waits each slot's semaphore right before the first
    chunk that reads its lanes, so later DMAs still fly under earlier
    chunks' compute.

    Unlike the slot-wise kernel, a fused chunk can hold the SAME target
    row twice: a dead slot's clamped window, the ≤127 rows of align-down
    slack overlapping the previous slot's tail, or a slot's post-window
    DMA tail running contiguously into the NEXT slot's window (adjacent
    slots are CSR-adjacent columns). In the slot-wise form those land in
    different chunks, where the strict (<) winner update keeps the tie
    count at 1; within one chunk a duplicated winner makes the equality
    "one-hot" multi-hot and mass-decertifies (measured 100% → 0.7%
    certified before this mask). A second scalar-prefetch array
    therefore carries, per slot, the packed pair
    ``(start − base) | (min(end − start, trange) << 7)`` — lanes outside
    [start−base, start−base+width) get d² = _BIG and never win, making
    slot lane ranges disjoint by construction. Masking the tail only
    removes candidates the certificate never counted on (the certificate
    radius is measured against the guaranteed window), so exactness is
    unchanged.

    Compile bound: the chunk loop is UNROLLED and Mosaic stacks each
    iteration's (tile_q, chunk) working set on the scoped-VMEM stack
    (~1 MB per 2048 lanes — see _COARSE_TRANGE_CAP), so slabs·trange
    beyond ~24576 total lanes fails to compile. Every auto-selected
    zcol configuration (zrange ≤ 1536 via the cost-model gate) is well
    inside; explicit larger zranges should stay on the slot-wise form.
    """
    total = slabs * trange
    chunk = min(chunk, total)
    n_chunks = -(-total // chunk)

    def kernel(base_ref, slack_ref, q_ref, tgt_ref, out_ref, cand, sems):
        i = pl.program_id(0)
        big = _BIG

        def get_dma(s):
            b = pl.multiple_of(base_ref[i * slabs + s], 128)
            return pltpu.make_async_copy(
                tgt_ref.at[:, pl.ds(b, trange)],
                cand.at[:, pl.ds(s * trange, trange)],
                sems.at[s],
            )

        for s in range(slabs):
            get_dma(s).start()

        qx = q_ref[0, 0, :]
        qy = q_ref[0, 1, :]
        qz = q_ref[0, 2, :]

        best_d2 = jnp.full((tile_q,), big, jnp.float32)
        best_xyz = jnp.zeros((tile_q, 6), jnp.float32)
        best_cnt = jnp.ones((tile_q,), jnp.float32)

        waited = 0
        for k in range(n_chunks):
            w = min(chunk, total - k * chunk)
            # Wait exactly the slots whose lanes this chunk reads (static
            # schedule — slabs/trange/chunk are Python ints).
            need = -(-(k * chunk + w) // trange)
            while waited < need:
                get_dma(waited).wait()
                waited += 1
            # Per-lane validity: lane offset within its slot must fall in
            # [slack, slack + width). Slot boundaries inside the chunk
            # are static, so the masks are built segment-wise.
            segs = []
            lo = k * chunk
            while lo < k * chunk + w:
                s = lo // trange
                seg_w = min((s + 1) * trange, k * chunk + w) - lo
                off0 = lo - s * trange
                v = slack_ref[i * slabs + s]
                u = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, seg_w), 1)
                    + off0
                    - (v & 127)
                )
                segs.append((u >= 0) & (u < (v >> 7)))
                lo += seg_w
            ok = jnp.concatenate(segs, axis=1)[0]  # (w,)
            c = cand[:, k * chunk : k * chunk + w]  # (8, w)
            d2 = (
                (qx[:, None] - c[0, :][None, :]) ** 2
                + (qy[:, None] - c[1, :][None, :]) ** 2
                + (qz[:, None] - c[2, :][None, :]) ** 2
            )
            d2 = jnp.where(ok[None, :], d2, big)
            dmin = jnp.min(d2, axis=1)
            if first_tie:
                j = jnp.argmin(d2, axis=1)
                oh_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_q, w), 1
                )
                onehot = (oh_iota == j[:, None]).astype(jnp.float32)
            else:
                onehot = (d2 == dmin[:, None]).astype(jnp.float32)
            # bf16-split exact extraction — see _colsweep_kernel.
            c6 = c[0:6, :]
            c_hi = c6.astype(jnp.bfloat16).astype(jnp.float32)
            r1 = c6 - c_hi
            c_mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
            c_lo = r1 - c_mid
            c3 = jnp.concatenate(
                [c_hi, c_mid, c_lo, jnp.ones((1, w), jnp.float32)],
                axis=0,
            )
            ext = jax.lax.dot_general(
                onehot, c3, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            coords = ext[:, 0:6] + ext[:, 6:12] + ext[:, 12:18]
            take = dmin < best_d2
            best_d2 = jnp.where(take, dmin, best_d2)
            best_xyz = jnp.where(take[:, None], coords, best_xyz)
            best_cnt = jnp.where(take, ext[:, 18], best_cnt)

        out_ref[0, 0:6, :] = best_xyz.T
        out_ref[0, 6, :] = best_d2
        out_ref[0, 7, :] = best_cnt

    return kernel


def _sweep_kernel_call(base, q32, tgt_t, *, slabs: int, trange: int,
                       tile_q: int, first_tie: bool, fused: bool = False,
                       slack=None, chunk: int = 2048):
    """Shared kernel invocation for the sweep variants.

    ``base``: (t, slabs) int32 HBM row bases (128-aligned, clamped);
    ``q32``: (t·tile_q, 3) f32 queries. Returns (t, 8, tile_q) f32 —
    rows 0-5 winner xyz+normal, row 6 d², row 7 winning-chunk hit count.

    ``fused=True`` uses the contiguous-buffer kernel
    (``_colsweep_fused_kernel``) — the many-short-slabs shape; ``slack``
    (t, slabs) int32 then gives each slot's leading ignored-lane count
    (alignment slack / dead-slot suppression — see the kernel docstring).
    """
    t = base.shape[0]
    # Queries transposed per tile for the kernel: (t, 8, tile_q) with the
    # coordinate rows in 0-2 (sublane dim padded to 8 for TPU tiling).
    q_tiles = jnp.zeros((t, 8, tile_q), jnp.float32)
    q_tiles = q_tiles.at[:, 0:3, :].set(
        q32.reshape(t, tile_q, 3).transpose(0, 2, 1)
    )

    if fused:
        kernel = _colsweep_fused_kernel(
            slabs, trange, tile_q, chunk=chunk, first_tie=first_tie
        )
        scratch = [
            pltpu.VMEM((8, slabs * trange), jnp.float32),
            pltpu.SemaphoreType.DMA((slabs,)),
        ]
    else:
        kernel = _colsweep_kernel(slabs, trange, tile_q, chunk=chunk,
                                  first_tie=first_tie)
        scratch = [
            pltpu.VMEM((2, 8, trange), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    def call_kernel(base_part, q_part, slack_part=None):
        tp = q_part.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if fused else 1,
            grid=(tp,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, tile_q), lambda i, *refs: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 8, tile_q), lambda i, *refs: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=scratch,
        )
        prefetch = (
            (base_part.reshape(-1), slack_part.reshape(-1))
            if fused
            else (base_part.reshape(-1),)
        )
        (o,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((tp, 8, tile_q), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=9 * tp * slabs * tile_q * trange,
                bytes_accessed=tp * slabs * trange * 12,
                transcendentals=0,
            ),
            # CPU test environments run the TPU kernel in interpreter mode.
            interpret=(jax.default_backend() != "tpu"),
        )(*prefetch, q_part, tgt_t)
        return o

    # The scalar-prefetch base table lives in SMEM (1 MB): t·slabs int32
    # overflows it past ~49k tiles (≈6.3M queries at tile_q=128). Split
    # the tile axis into equal parts that fit — identical part shapes
    # reuse one kernel compile; each part is still tens of thousands of
    # grid steps, so the split costs nothing.
    t_cap = max((_SMEM_PREFETCH_BUDGET // 4) // (slabs * (2 if fused else 1)),
                1)
    if t <= t_cap:
        return call_kernel(base, q_tiles, slack)
    parts = -(-t // t_cap)
    t_part = -(-t // parts)
    pad_t = parts * t_part - t
    if pad_t:
        base = jnp.concatenate(
            [base, jnp.broadcast_to(base[-1:], (pad_t, slabs))], axis=0
        )
        q_tiles = jnp.concatenate(
            [q_tiles, jnp.broadcast_to(q_tiles[-1:], (pad_t, 8, tile_q))],
            axis=0,
        )
        if slack is not None:
            slack = jnp.concatenate(
                [slack, jnp.broadcast_to(slack[-1:], (pad_t, slabs))],
                axis=0,
            )
    return jnp.concatenate(
        [
            call_kernel(
                base[p * t_part:(p + 1) * t_part],
                q_tiles[p * t_part:(p + 1) * t_part],
                slack[p * t_part:(p + 1) * t_part]
                if slack is not None else None,
            )
            for p in range(parts)
        ],
        axis=0,
    )[:t]


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "tile_q", "slabs", "trange", "first_tie",
                     "fused", "chunk", "return_tie"),
)
def nn_colsweep(
    query: jnp.ndarray,
    grid: PallasGrid,
    *,
    resolution: int,
    tile_q: int = 128,
    slabs: int = 6,
    trange: int = 2048,
    first_tie: bool = False,
    fused: bool = False,
    chunk: int = 2048,
    return_tie: bool = False,
):
    """Slab-sweep grid 1-NN (Pallas).

    ``query``: (N, 3), Morton-sorted for coherence, any N (padded here by
    replicating the last row). Returns (matched (N,3), normal (N,3) —
    zeros unless the grid packs normals, dist (N,), certified (N,) bool).

    ``fused=True`` routes through the fused-buffer kernel
    (``_colsweep_fused_kernel``) — full-width chunks across slab
    boundaries with per-slab (slack|width) masks. At sub-2048 tranges
    the slot-wise chunk loop pays per-chunk fixed costs exactly like the
    zcol kernel did (round-4 W1); the masks make it exact-equivalent.
    """
    R = resolution
    n_in = query.shape[0]
    n = -(-n_in // tile_q) * tile_q
    if n != n_in:
        query = jnp.concatenate(
            [query, jnp.broadcast_to(query[-1], (n - n_in, 3))], axis=0
        )
    t = n // tile_q
    m_rows = grid.tgt_t.shape[1]

    q32 = query.astype(jnp.float32)
    qc_f = (q32 - grid.origin.astype(jnp.float32)) / grid.cell_size.astype(
        jnp.float32
    )
    qcell = jnp.floor(qc_f).astype(jnp.int32)
    # Clamp to the OCCUPIED cell range per axis, not just the grid cube:
    # the cube spans the longest axis in every dim, so on shorter axes a
    # band of empty cells lies past the target's true edge. A query out
    # there would otherwise window nothing but empty cells and could
    # never see the boundary face where its true NN lives (multi-scan
    # partial-overlap strips: 43% of strip queries fell through to
    # repair from exactly this). Clamping to the occupied edge is the
    # same mechanism as the existing grid-edge clamp — the certificate
    # measures distances from the TRUE (unclipped) position either way.
    occ_hi = jnp.minimum(
        jnp.floor(
            (grid.bbox_hi.astype(jnp.float32)
             - grid.origin.astype(jnp.float32))
            / grid.cell_size.astype(jnp.float32)
        ).astype(jnp.int32),
        R - 1,
    )
    qcell = jnp.clip(qcell, 0, occ_hi[None, :])

    qc_t = qcell.reshape(t, tile_q, 3)
    minc = jnp.min(qc_t, axis=1)  # (t, 3)
    maxc = jnp.max(qc_t, axis=1)

    # Slab s covers x = minx-1+s, y ∈ [miny-1, maxy+1], all z: one
    # contiguous row range [col_start[x·R+ylo], col_start[x·R+yhi+1]).
    s_ix = jnp.arange(slabs, dtype=jnp.int32)
    xs = minc[:, 0:1] - 1 + s_ix[None, :]          # (t, slabs)
    x_ok = (xs >= 0) & (xs < R) & (xs <= maxc[:, 0:1] + 1)
    xs_cl = jnp.clip(xs, 0, R - 1)
    y_lo = jnp.clip(minc[:, 1] - 1, 0, R - 1)[:, None]
    y_hi = jnp.clip(maxc[:, 1] + 1, 0, R - 1)[:, None]
    start = grid.col_start[xs_cl * R + y_lo]
    end = grid.col_start[xs_cl * R + y_hi + 1]
    start = jnp.where(x_ok, start, 0)
    end = jnp.where(x_ok, end, 0)

    # Slab DMA bases are aligned down to 128 lanes (HBM tile granularity);
    # the fit margin accounts for up to 127 rows of alignment slack.
    slab_fit = (end - start) <= trange - 128  # (t, slabs)

    # Per-query certification (not per-tile): a query needs its own x±1
    # slabs present and within the range cap; y is always fully covered by
    # the dynamic [miny-1, maxy+1] span, z by the full column.
    #
    # The per-query lookup into the (t, slabs) fit table is done as a
    # one-hot select over the (static, tiny) slab axis — NOT
    # take_along_axis, whose row gather costs ~30 ns/row on TPU: three
    # dx-shifted 1M-row gathers profiled at 33 ms/iteration, >20% of the
    # whole ICP step.
    sx = qc_t[..., 0] - (minc[:, 0:1] - 1)  # (t, tile_q) slab coord
    in_box = sx + 1 <= slabs - 1
    # fit3_tab[t, s] = slab_fit[t, clip(s-1)] & [s] & [clip(s+1)]
    fit3_tab = slab_fit
    fit3_tab = fit3_tab & jnp.concatenate(
        [slab_fit[:, :1], slab_fit[:, :-1]], axis=1
    )
    fit3_tab = fit3_tab & jnp.concatenate(
        [slab_fit[:, 1:], slab_fit[:, -1:]], axis=1
    )
    s_iota = jnp.arange(slabs, dtype=sx.dtype)
    fit3 = jnp.any(
        (sx[..., None] == s_iota) & fit3_tab[:, None, :], axis=-1
    )  # (t, tile_q)
    query_complete = (in_box & fit3).reshape(n)

    # Certificate radius = distance from the query POINT to the edge of
    # its guaranteed-covered window (x: own ±1 cells; y: the tile's
    # dilated span; z: unbounded) — not the conservative one-cell bound.
    # A window edge at/beyond the grid boundary certifies to infinity
    # (no target exists beyond it). Two consequences: ~1.5x radius for
    # interior queries, and — because the position ``pq`` is the UNCLIPPED
    # one — queries *outside* the target bbox certify exactly as well
    # (their cell clips to the boundary, whose outward edge is infinite
    # and whose inward edge distance is measured from the true position).
    # Source points just outside the target bbox are ~1% of every real
    # scan pair and used to fall through to brute-force repair forever.
    cs = grid.cell_size.astype(jnp.float32)
    org = grid.origin.astype(jnp.float32)
    pq = (q32 - org[None, :]).reshape(t, tile_q, 3)
    inf = jnp.asarray(jnp.inf, jnp.float32)
    hi_rel = grid.bbox_hi.astype(jnp.float32) - org  # true per-axis extent
    # A window edge at/beyond the GRID boundary certifies to infinity (no
    # cells exist beyond it); a window edge strictly beyond the TARGET's
    # true extent does too (the grid cube spans the longest axis in every
    # dim — on shorter axes whole empty cell bands lie between the
    # target's real edge and the cube's, and no candidate lives there).
    qx_c = qc_t[..., 0]
    rx_lo = jnp.where(qx_c <= 1, inf, pq[..., 0] - (qx_c - 1) * cs)
    rx_hi = jnp.where(
        (qx_c >= R - 2) | ((qx_c + 2) * cs > hi_rel[0]),
        inf, (qx_c + 2) * cs - pq[..., 0],
    )
    my_lo = minc[:, 1:2]
    my_hi = maxc[:, 1:2]
    ry_lo = jnp.where(my_lo <= 1, inf, pq[..., 1] - (my_lo - 1) * cs)
    ry_hi = jnp.where(
        (my_hi >= R - 2) | ((my_hi + 2) * cs > hi_rel[1]),
        inf, (my_hi + 2) * cs - pq[..., 1],
    )
    rx = jnp.minimum(rx_lo, rx_hi)
    ry = jnp.minimum(ry_lo, ry_hi)
    # Out-of-bbox strengthening: every target point lies inside the grid
    # bbox, so a query outside it by gap g_b in dim b has |Δb| ≥ g_b for
    # EVERY candidate. A candidate not in the searched window must
    # escape it in x or y (z is fully covered); an x-escapee satisfies
    # |Δx| ≥ rx AND the bbox gaps in y/z simultaneously, so
    #   radius = min( sqrt(rx² + gy² + gz²), sqrt(ry² + gx² + gz²) ).
    # Interior queries have g = 0 and recover the old min(rx, ry)
    # exactly; boundary-strip queries (multi-scan partial-overlap edges:
    # true NN meters away at the target's boundary face) gain the gap
    # term and certify at the FINE level instead of falling through the
    # whole repair chain every iteration (traced: 0.38 s/iter of brute).
    gx = jnp.maximum(jnp.maximum(-pq[..., 0], pq[..., 0] - hi_rel[0]), 0.0)
    gy = jnp.maximum(jnp.maximum(-pq[..., 1], pq[..., 1] - hi_rel[1]), 0.0)
    gz = jnp.maximum(jnp.maximum(-pq[..., 2], pq[..., 2] - hi_rel[2]), 0.0)
    radius = jnp.minimum(
        jnp.sqrt(rx * rx + gy * gy + gz * gz),
        jnp.sqrt(ry * ry + gx * gx + gz * gz),
    ).reshape(n)

    base = jnp.minimum(start, m_rows - trange).astype(jnp.int32)
    base = (base // 128) * 128

    slack = None
    if fused:
        # Packed (slack | width<<7); dead slabs have start = end = 0 →
        # width 0, every lane masked (see _colsweep_fused_kernel).
        slack = (
            (start - base)
            | (jnp.minimum(end - start, trange) << 7)
        ).astype(jnp.int32)
    out = _sweep_kernel_call(
        base, q32, grid.tgt_t, slabs=slabs, trange=trange, tile_q=tile_q,
        first_tie=first_tie, fused=fused, slack=slack, chunk=chunk,
    )

    d2 = out[:, 6, :].reshape(n)
    # Row 7 = winning-chunk hit count: ≠ 1 means an exact d² tie, whose
    # summed "one-hot" extraction is not a target point — decertify so
    # the repair chain (XLA brute force) resolves it in first-tie order.
    unique = out[:, 7, :].reshape(n) == 1.0
    dist = jnp.sqrt(jnp.maximum(d2, 0.0)).astype(query.dtype)
    matched = out[:, 0:3, :].transpose(0, 2, 1).reshape(n, 3).astype(query.dtype)
    normal = out[:, 3:6, :].transpose(0, 2, 1).reshape(n, 3).astype(query.dtype)
    certified = query_complete & (dist <= radius) & unique
    if return_tie:
        # Tie-decertified rows (certificate held, winner not unique):
        # the coarse-grid repair CANNOT fix these — the same d² tie
        # decertifies at every grid level — so the repair chain routes
        # them straight to the budgeted brute stage (which preserves
        # the reference's first-tie order). Round 5: before this split
        # the every-iteration tie drizzle fired a 64-tile coarse
        # re-sweep (~1.6 ms/iter at 1M) that never repaired anything.
        tie = query_complete & (dist <= radius) & ~unique
        return (matched[:n_in], normal[:n_in], dist[:n_in],
                certified[:n_in], tie[:n_in])
    return matched[:n_in], normal[:n_in], dist[:n_in], certified[:n_in]


@functools.partial(jax.jit, static_argnames=("resolution", "zrange",
                                              "mask_far"))
def _build_zgrid_dev(target, origin, cell_size, *, resolution: int,
                     zrange: int, normals=None, mask_far: bool = False):
    """On-device ZPallasGrid build (volume regime).

    Same stable cell sort as ``_build_grid_dev`` but with the FULL R³ CSR
    so the column kernel can address per-(x,y,z-window) runs. The CSR
    comes from a scatter-add bincount + cumsum rather than an R³+1
    searchsorted — the binary-search row gathers were 40 of 43 ms of the
    round-1 grid build at R=64; the bincount form is one O(N) scatter and
    an O(R³) cumsum. Only sensible at the volume regime's small R.
    """
    R = resolution
    tgt = target.astype(jnp.float32)
    org = origin.astype(jnp.float32)
    cs = cell_size.astype(jnp.float32)
    coords = jnp.clip(((tgt - org[None, :]) / cs).astype(jnp.int32), 0, R - 1)
    cid = (coords[:, 0] * R + coords[:, 1]) * R + coords[:, 2]
    if mask_far:
        cid = jnp.where(tgt[:, 0] >= _FAR * 0.5, R * R * R, cid)

    ops = [cid, tgt[:, 0], tgt[:, 1], tgt[:, 2]]
    if normals is not None:
        nf = normals.astype(jnp.float32)
        ops += [nf[:, 0], nf[:, 1], nf[:, 2]]
    sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=True)

    cnts = jnp.zeros(R**3 + 2, jnp.int32).at[
        jnp.minimum(cid, R**3) + 1
    ].add(1)
    cell_start = jnp.cumsum(cnts)[: R**3 + 1].astype(jnp.int32)

    top = jnp.concatenate(
        [jnp.stack(sorted_ops[1:4]),
         jnp.full((3, zrange), _FAR, jnp.float32)], axis=1
    )
    m = tgt.shape[0]
    if normals is not None:
        nrows = jnp.concatenate(
            [jnp.stack(sorted_ops[4:7]),
             jnp.zeros((3, zrange), jnp.float32)], axis=1
        )
        tt = jnp.concatenate(
            [top, nrows, jnp.full((2, m + zrange), _FAR, jnp.float32)],
            axis=0,
        )
    else:
        tt = jnp.concatenate(
            [top, jnp.full((5, m + zrange), _FAR, jnp.float32)], axis=0
        )
    real = (tgt[:, 0] < _FAR * 0.5)[:, None]
    hi3 = jnp.max(
        jnp.where(real, tgt, jnp.asarray(-_FAR, jnp.float32)), axis=0
    )
    return ZPallasGrid(tgt_t=tt, cell_start=cell_start, origin=org,
                       cell_size=cs, bbox_hi=hi3)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "tile_q", "xy_slots", "zrange",
                     "first_tie", "return_tie", "chunk"),
)
def nn_colsweep_z(
    query: jnp.ndarray,
    grid: ZPallasGrid,
    *,
    resolution: int,
    tile_q: int = 128,
    xy_slots: int = 12,
    zrange: int = 512,
    first_tie: bool = False,
    return_tie: bool = False,
    chunk: int = 3072,
):
    """Z-window COLUMN sweep (Pallas) — the volume-regime 1-NN kernel.

    ``chunk``: 3072 measured best on the auto volume config (12 slots ×
    zrange 512 = 6144 fused lanes; tools/exp_zcol_chunk.py: 32.7 ms at
    2048, 31.7 at 3072, 32.2 at a single 6144 chunk — bit-exact).

    The x-slab sweep (``nn_colsweep``) reads each slab's FULL z column,
    which is the right shape for scan surfaces (z nearly a function of
    x,y) but sweeps ~4-16× too many rows on volumetric clouds. Here the
    query layout aligns tiles to (x,y)-cell GROUPS
    (``grouped_tile_order_device(group="xy")``), so a tile's z-span is a
    few cells, and each kernel program DMAs only the z-window
    [minz-1, maxz+1] of every (x,y) column in the dilated window
    [minx-1, maxx+1] × [miny-1, maxy+1] — up to ``xy_slots`` short
    (8, zrange) copies addressed through the full R³ CSR.

    Same kernel body, same no-row-mask superset argument (a DMA may run
    past its column's window into the next column's rows — those are real
    target points or _FAR pad), same equality-one-hot extraction and tie
    decertification as ``nn_colsweep``. A tile whose dilated window needs
    more than ``xy_slots`` columns (source drift) or whose columns exceed
    ``zrange`` decertifies into the shared repair chain — exactness is
    identical.

    Returns (matched (N,3), normal (N,3), dist (N,), certified (N,)).
    """
    R = resolution
    n_in = query.shape[0]
    n = -(-n_in // tile_q) * tile_q
    if n != n_in:
        query = jnp.concatenate(
            [query, jnp.broadcast_to(query[-1], (n - n_in, 3))], axis=0
        )
    t = n // tile_q
    m_rows = grid.tgt_t.shape[1]

    q32 = query.astype(jnp.float32)
    cs = jnp.broadcast_to(
        grid.cell_size.astype(jnp.float32), (3,)
    )  # anisotropic per-axis cells (flat-box clouds need fine z cells)
    org = grid.origin.astype(jnp.float32)
    qc_f = (q32 - org) / cs
    occ_hi = jnp.minimum(
        jnp.floor(
            (grid.bbox_hi.astype(jnp.float32) - org) / cs
        ).astype(jnp.int32),
        R - 1,
    )
    # Occupied-range clamp (see nn_colsweep): queries beyond the target's
    # true edge window the boundary cells instead of empty ones.
    qcell = jnp.clip(jnp.floor(qc_f).astype(jnp.int32), 0, occ_hi[None, :])

    qc_t = qcell.reshape(t, tile_q, 3)
    minc = jnp.min(qc_t, axis=1)  # (t, 3)
    maxc = jnp.max(qc_t, axis=1)

    lo = jnp.clip(minc - 1, 0, R - 1)  # (t, 3) window low cells
    hi = jnp.clip(maxc + 1, 0, R - 1)
    nx = hi[:, 0] - lo[:, 0] + 1
    ny = hi[:, 1] - lo[:, 1] + 1

    # Slot k → (dx, dy) in the tile's dynamic nx×ny column window.
    k = jnp.arange(xy_slots, dtype=jnp.int32)[None, :]
    ny_c = jnp.maximum(ny, 1)[:, None]
    dx = k // ny_c
    dy = k % ny_c
    in_win = dx < nx[:, None]
    xs = jnp.clip(lo[:, 0:1] + dx, 0, R - 1)
    ys = jnp.clip(lo[:, 1:2] + dy, 0, R - 1)
    col = (xs * R + ys) * R
    start = grid.cell_start[col + lo[:, 2:3]]
    end = grid.cell_start[col + hi[:, 2:3] + 1]
    start = jnp.where(in_win, start, 0)
    end = jnp.where(in_win, end, 0)

    # Fit: every window column's rows within the zrange budget (128 rows
    # of alignment slack), and the window itself within the slot budget.
    col_fit = (end - start) <= zrange - 128
    tile_ok = jnp.all(col_fit, axis=1) & (nx * ny <= xy_slots)  # (t,)

    # Certificate radius: distance to the covered window's edge in all
    # three dims (grid-boundary edges are infinite — nothing beyond).
    pq = (q32 - org[None, :]).reshape(t, tile_q, 3)
    inf = jnp.asarray(jnp.inf, jnp.float32)
    rs = []
    gaps = []
    for a in range(3):
        lo_c = minc[:, a:a + 1]
        hi_c = maxc[:, a:a + 1]
        hi_a = grid.bbox_hi.astype(jnp.float32)[a] - org[a]
        r_lo = jnp.where(lo_c <= 1, inf, pq[..., a] - (lo_c - 1) * cs[a])
        r_hi = jnp.where(
            (hi_c >= R - 2) | ((hi_c + 2) * cs[a] > hi_a),
            inf, (hi_c + 2) * cs[a] - pq[..., a],
        )
        rs.append(jnp.minimum(r_lo, r_hi))
        # Out-of-bbox gap per dim (see nn_colsweep: a window-escapee in
        # dim a also satisfies the bbox gaps in the other dims, so each
        # escape bound is sqrt(r_a² + Σ_{b≠a} g_b²); interior queries
        # have g = 0 and recover the plain min radius).
        gaps.append(
            jnp.maximum(jnp.maximum(-pq[..., a], pq[..., a] - hi_a), 0.0)
        )
    g2 = [g * g for g in gaps]
    esc = [
        jnp.sqrt(rs[a] * rs[a] + sum(g2[b] for b in range(3) if b != a))
        for a in range(3)
    ]
    radius = jnp.minimum(jnp.minimum(esc[0], esc[1]), esc[2]).reshape(n)

    base = jnp.minimum(start, m_rows - zrange).astype(jnp.int32)
    base = (base // 128) * 128

    # Fused-buffer kernel (round-4 W1): the 12 short slot DMAs land in one
    # contiguous VMEM buffer so the chunk loop runs 2048-wide across slot
    # boundaries — the slot-wise form paid ~55% in per-chunk fixed costs
    # at 512-lane chunks (tools/exp_zsweep.py). ``slack`` masks each
    # slot's leading alignment-slack lanes (dead slots entirely) so no
    # target row appears twice within a chunk — a duplicated winner would
    # otherwise read as an exact tie and mass-decertify. Falls back to
    # the slot-wise form when the fused buffer would blow the unrolled
    # chunk loop's scoped-VMEM bound (auto-selected configs never do).
    use_fused = xy_slots * zrange <= 24576
    # Packed (slack | width<<7): dead slots have start = end = 0 → base 0,
    # slack 0, width 0 — every lane masked without a separate flag.
    slack = (
        (start - base)
        | (jnp.minimum(end - start, zrange) << 7)
    ).astype(jnp.int32)
    out = _sweep_kernel_call(
        base, q32, grid.tgt_t, slabs=xy_slots, trange=zrange,
        tile_q=tile_q, first_tie=first_tie,
        fused=use_fused, slack=slack if use_fused else None,
        # The 3072 default is measured on the FUSED form; the slot-wise
        # fallback (explicit zrange > 2048 only) keeps its proven 2048.
        chunk=chunk if use_fused else min(chunk, 2048),
    )

    d2 = out[:, 6, :].reshape(n)
    unique = out[:, 7, :].reshape(n) == 1.0
    dist = jnp.sqrt(jnp.maximum(d2, 0.0)).astype(query.dtype)
    matched = out[:, 0:3, :].transpose(0, 2, 1).reshape(n, 3).astype(
        query.dtype)
    normal = out[:, 3:6, :].transpose(0, 2, 1).reshape(n, 3).astype(
        query.dtype)
    complete = jnp.broadcast_to(tile_ok[:, None], (t, tile_q)).reshape(n)
    certified = complete & (dist <= radius) & unique
    if return_tie:
        # See nn_colsweep: tie-decertified rows route straight to brute
        # (no grid level can certify an exact d² tie).
        tie = complete & (dist <= radius) & ~unique
        return (matched[:n_in], normal[:n_in], dist[:n_in],
                certified[:n_in], tie[:n_in])
    return matched[:n_in], normal[:n_in], dist[:n_in], certified[:n_in]


@functools.partial(
    jax.jit,
    static_argnames=(
        "resolution", "coarse_resolution", "tile_q", "slabs", "trange",
        "coarse_trange", "coarse_budget", "coarse_passes", "brute_batch",
        "brute_passes", "global_fallback", "fine", "xy_slots",
        "return_certified",
    ),
)
def nn_colsweep_exact(
    query: jnp.ndarray,
    target: jnp.ndarray,
    grid: "PallasGrid | ZPallasGrid",
    coarse_grid: "PallasGrid | None" = None,
    target_normals: "jnp.ndarray | None" = None,
    *,
    resolution: int,
    coarse_resolution: int = 0,
    tile_q: int = 128,
    slabs: int = 6,
    trange: int = 2048,
    coarse_trange: int = 16384,
    coarse_budget: int = 65536,
    coarse_passes: int = 4,
    brute_batch: int = 4096,
    brute_passes: int = 16,
    global_fallback: bool = True,
    fine: str = "sweep",
    xy_slots: int = 12,
    return_certified: bool = False,
):
    """Exact NN: fine kernel → coarse-kernel repair → budgeted brute →
    global cond fallback.

    ``return_certified=True`` appends a per-query certainty mask: True
    when the result is PROVEN exact (kernel certificate, coarse-repair
    certificate, or brute-force repair within budget). Only budget
    overflow with ``global_fallback=False`` leaves False rows. The
    partitioned-target path uses this to compose the slab-local chain
    with its halo-margin certificate.

    Uncertified fine-level queries (tile-geometry stragglers, moderate
    misalignments) are compacted and re-searched with the *same* kernel on
    a 4×-coarser grid whose certificate radius is 4 cells wide — orders of
    magnitude cheaper than brute-forcing them. Only queries uncertified at
    both levels (far outliers) reach the brute passes.

    ``global_fallback=False`` drops the all-pairs escape hatch (an
    N×M-scale branch that is unaffordable to even *compile* at N ≥ 1M):
    exactness then holds whenever uncertified queries fit the
    coarse/brute budgets — which coarse-to-fine alignment
    (models/multiscale.py) guarantees in practice.

    ``target_normals`` (M,3) enables point-to-plane support: the repaired
    matches' normals are gathered alongside (the kernel path extracts
    them from the packed grid rows for free).

    Repair bookkeeping runs at **tile granularity** (tile_q queries per
    tile): compaction is an argsort over ~N/tile_q per-tile "any
    uncertified" flags — not over N queries — and both repair stages sit
    behind ``lax.cond`` on the bad-tile count, so a fully-certified pass
    (the steady state under coarse-to-fine init) costs exactly the fine
    kernel plus an O(N) mask reduction. Selected tiles are re-searched
    whole; overwriting an already-certified query with another certified
    (or brute-force) result is harmless because every certified result is
    the exact 1-NN.

    Returns (matched (N,3), normal (N,3) — zeros when no normals, dist).
    """
    n_in = query.shape[0]
    t = -(-n_in // tile_q)
    n = t * tile_q
    if n != n_in:
        query = jnp.concatenate(
            [query, jnp.broadcast_to(query[-1], (n - n_in, 3))], axis=0
        )

    if fine == "zcol":
        # Volume regime: z-window column kernel (tile layout must be
        # (x,y)-group-aligned — grouped_tile_order_device(group="xy")).
        m3, nrm, dist, certified, tie = nn_colsweep_z(
            query, grid, resolution=resolution, tile_q=tile_q,
            xy_slots=xy_slots, zrange=trange, return_tie=True,
        )
    else:
        # Fused-buffer form at sub-2048 tranges (round-4: the slot-wise
        # chunk loop pays per-chunk fixed costs at narrow chunks — strip
        # edges at R=128/trange=768 measured 12.3 → 10.1 ms fused;
        # trange 1536 is neutral, larger tranges already run full-width
        # chunks). The coarse repair grid (trange 16384) stays slot-wise
        # (the fused buffer would blow the unrolled-chunk VMEM bound).
        m3, nrm, dist, certified, tie = nn_colsweep(
            query, grid, resolution=resolution, tile_q=tile_q, slabs=slabs,
            trange=trange, fused=use_fused_sweep(slabs, trange),
            chunk=fused_sweep_chunk(slabs, trange), return_tie=True,
        )
    matched = jnp.concatenate([m3, nrm], axis=1)  # (N, 6): xyz + normal

    q_t = query.reshape(t, tile_q, 3)
    m_t = matched.reshape(t, tile_q, 6)
    d_t = dist.reshape(t, tile_q)
    c_t = certified.reshape(t, tile_q)
    # Tie-decertified rows skip the coarse stages entirely (no grid
    # level can certify an exact d² tie; only the brute stage resolves
    # them, in first-tie order): the coarse repair's bad-tile census
    # counts DISTANCE-decertified rows only. A tile holding both kinds
    # is still coarse-repaired (the drift rows make it bad) and its tie
    # rows fall through to brute exactly as before.
    tie_t = tie.reshape(t, tile_q)

    def tgt6(bi):
        bm = target[bi]
        if target_normals is not None:
            return jnp.concatenate([bm, target_normals[bi]], axis=1)
        return jnp.concatenate([bm, jnp.zeros_like(bm)], axis=1)

    if coarse_grid is not None and coarse_resolution:
        ct_full = max(min(coarse_budget // tile_q, t), 1)
        # Budget stages: in the drift steady state (coarse-to-fine
        # init, source jiggling by millimeters per iteration) only ~0.05%
        # of queries decertify — a handful of tiles — yet a single
        # full-budget stage re-sweeps its whole ``ct_full``-tile batch
        # against the coarse grid every iteration (profiled 46 ms/iter at
        # 1M pts). A small first stage covers the drizzle at ~1/8 the
        # cost; a middle stage (round 5) covers the moderate drift tail
        # (the 1M bench traced 4/20 iterations overflowing the 64-tile
        # stage into the 512-tile full budget at 12.8 ms per firing —
        # a 192-tile stage covers those at ~1/3 the cost); the full
        # stage only fires when both overflow (cold starts, large
        # misalignments).
        ct_small = max(min(64, ct_full // 2), 1)
        ct_mid = max(min(3 * ct_small, ct_full // 2), 1)

        def mk_repair(ct):
            """Coarse-repair the first ``ct`` tiles of the bad-first tile
            permutation (recomputed against the carry's current mask —
            still-bad tiles always compact to the front). Tie-only tiles
            are never selected (coarse-unrepairable by construction)."""

            def coarse_repair(carry):
                m_t, d_t, c_t = carry
                bad = jnp.any(~c_t & ~tie_t, axis=1)
                n_bad = jnp.sum(bad, dtype=jnp.int32)
                tsel = jnp.argsort((~bad).astype(jnp.int32), stable=True)[:ct]
                qc = q_t[tsel].reshape(ct * tile_q, 3)
                m_c, n_c, d_c, cert_c = nn_colsweep(
                    qc, coarse_grid, resolution=coarse_resolution,
                    tile_q=tile_q, slabs=slabs, trange=coarse_trange,
                )
                m_c6 = jnp.concatenate(
                    [m_c, n_c], axis=1
                ).reshape(ct, tile_q, 6)
                d_c = d_c.reshape(ct, tile_q)
                cert_c = cert_c.reshape(ct, tile_q)
                live = (jnp.arange(ct, dtype=jnp.int32) < n_bad)[:, None]
                upd = live & cert_c
                return (
                    m_t.at[tsel].set(
                        jnp.where(upd[..., None], m_c6, m_t[tsel])
                    ),
                    d_t.at[tsel].set(jnp.where(upd, d_c, d_t[tsel])),
                    c_t.at[tsel].set(c_t[tsel] | upd),
                )

            return coarse_repair

        # Stage 1 (the drizzle), a middle stage, then up to
        # ``coarse_passes`` full-budget passes before ANY brute
        # fallthrough: overlap-boundary workloads
        # (multi-scan edges — a strip of source points whose true NN sits
        # meters away at the target's boundary face) can decertify 5-10x
        # the coarse budget at once, and each brute pass costs ~60x a
        # coarse-kernel pass (measured 0.9 s/iter of brute at an
        # 800k-point partial-overlap edge vs ~15 ms per coarse pass).
        # Every census counts COARSE-REPAIRABLE tiles (``~c_t & ~tie_t``
        # — tie-only tiles go straight to brute), so the every-iteration
        # tie drizzle no longer fires any coarse stage. The middle stage
        # fires on small-stage overflow; the FIRST full pass fires on
        # any leftover after it (the pre-round-3 single-stage behavior —
        # the smaller stages may repair nothing while hundreds of later
        # bad tiles are still certifiable, so gating pass 1 on their
        # progress could strand certifiable tiles on the ~60x brute
        # path, or leave them UNREPAIRED past the brute budget with
        # global_fallback off). Passes 2..N are PROGRESS-gated: they
        # fire only while the previous pass kept certifying tiles
        # (count strictly decreasing), so a leftover of
        # coarse-UNCERTIFIABLE tiles (true-far outliers) stops the
        # chain instead of re-sweeping the same tiles futilely — the
        # certified steady state pays only O(t) mask reductions behind
        # false conds, exactly as before.
        def n_coarse_bad():
            return jnp.sum(jnp.any(~c_t & ~tie_t, axis=1),
                           dtype=jnp.int32)

        n_bad0 = n_coarse_bad()
        if os.environ.get("ICP_DEBUG_REPAIR"):
            # Repair-traffic observability (compiled-loop ground truth;
            # free when the env flag is unset — the branch is traced
            # out). Counts tiles entering each repair tier. NOTE: uses
            # jax.debug.print, which the axon tunnel backend does not
            # support (no host callbacks) — CPU / standard TPU only;
            # over axon, attribute repair traffic from a profiler trace
            # (the per-stage kernel shapes identify each tier).
            jax.debug.print(
                "repair-census: coarse-bad {} / uncert-q {} / tie-q {}",
                n_bad0, jnp.sum(~c_t), jnp.sum(tie_t),
            )
        m_t, d_t, c_t = jax.lax.cond(
            n_bad0 > 0, mk_repair(ct_small), lambda c: c, (m_t, d_t, c_t)
        )
        if ct_mid > ct_small and ct_full > ct_mid:
            m_t, d_t, c_t = jax.lax.cond(
                n_bad0 > ct_small, mk_repair(ct_mid), lambda c: c,
                (m_t, d_t, c_t),
            )
        if ct_full > ct_small:
            n_prev = None
            for _ in range(coarse_passes):
                n_now = n_coarse_bad()
                fire = (
                    n_now > 0
                    if n_prev is None
                    else (n_now > 0) & (n_now < n_prev)
                )
                m_t, d_t, c_t = jax.lax.cond(
                    fire, mk_repair(ct_full), lambda c: c, (m_t, d_t, c_t)
                )
                n_prev = n_now

    bad_tile2 = jnp.any(~c_t, axis=1)
    n_bad_t2 = jnp.sum(bad_tile2, dtype=jnp.int32)
    if os.environ.get("ICP_DEBUG_REPAIR"):
        jax.debug.print("repair-census: brute-bad {}", n_bad_t2)
    bt = max(brute_batch // tile_q, 1)         # tiles per brute pass
    kmax = min(brute_passes * bt, t)           # total tile budget
    # Staged like the coarse repair: in the steady state the queries that
    # fall all the way through to brute force are a handful of tiles
    # (exact-tie decertifications, permanent 3σ outliers), yet one full
    # brute pass re-sweeps its whole ``bt``-tile batch against the entire
    # target (traced ~100 ms per firing at 1M — 2 firings were 23% of the
    # bench fine loop). A small first stage covers those at ~1/8 the
    # cost; the full passes only fire when it overflows.
    bt_small = min(max(bt // 8, 1), kmax)

    def mk_brute(lo_tiles, nb):
        """Brute-repair tiles [lo_tiles, lo_tiles+nb) of the bad-first
        tile permutation."""

        def do(carry):
            mc, dc = carry
            tperm = jnp.argsort((~bad_tile2).astype(jnp.int32), stable=True)
            rows = jax.lax.dynamic_slice(tperm, (lo_tiles,), (nb,))
            qb = q_t[rows].reshape(nb * tile_q, 3)
            # Large target tiles: few scan steps per repair pass.
            bi, bd = nn_bruteforce(
                qb, target, query_chunk=nb * tile_q, target_tile=16384
            )
            bm = tgt6(bi).reshape(nb, tile_q, 6)
            bd = bd.reshape(nb, tile_q)
            live = (
                lo_tiles + jnp.arange(nb, dtype=jnp.int32) < n_bad_t2
            )[:, None]
            return (
                mc.at[rows].set(jnp.where(live[..., None], bm, mc[rows])),
                dc.at[rows].set(jnp.where(live, bd, dc[rows])),
            )

        return do

    if kmax > 0:
        # Stage 1: the drizzle (≤ bt_small bad tiles).
        m_t, d_t = jax.lax.cond(
            n_bad_t2 > 0, mk_brute(0, bt_small), lambda c: c, (m_t, d_t)
        )

        # Bulk passes: only when stage 1 overflowed. Tiles already fixed
        # by stage 1 are re-brute-forced (pass 0 starts at tile 0) —
        # harmless (same exact result), and it keeps every pass the same
        # compiled shape.
        def repair(carry):
            def pass_body(p, c):
                mc, dc = c

                def do_p(_):
                    # Dynamic start inside the fori body: slice via the
                    # same static-size helper at a traced offset. Clamp
                    # lo explicitly (dynamic_slice clamps internally; the
                    # live mask must use the SAME start or it marks the
                    # wrong rows of a tail window).
                    tperm = jnp.argsort(
                        (~bad_tile2).astype(jnp.int32), stable=True
                    )
                    nb = min(bt, kmax)
                    lo = jnp.minimum(p * bt, t - nb)
                    rows = jax.lax.dynamic_slice(tperm, (lo,), (nb,))
                    qb = q_t[rows].reshape(nb * tile_q, 3)
                    bi, bd = nn_bruteforce(
                        qb, target, query_chunk=nb * tile_q,
                        target_tile=16384,
                    )
                    bm = tgt6(bi).reshape(nb, tile_q, 6)
                    bd = bd.reshape(nb, tile_q)
                    live = (
                        lo + jnp.arange(nb, dtype=jnp.int32) < n_bad_t2
                    )[:, None]
                    return (
                        mc.at[rows].set(
                            jnp.where(live[..., None], bm, mc[rows])
                        ),
                        dc.at[rows].set(jnp.where(live, bd, dc[rows])),
                    )

                return jax.lax.cond(n_bad_t2 > p * bt, do_p, lambda _: c,
                                    None)

            return jax.lax.fori_loop(0, brute_passes, pass_body, carry)

        m_t, d_t = jax.lax.cond(
            n_bad_t2 > bt_small, repair, lambda c: c, (m_t, d_t)
        )

    if global_fallback:
        def global_brute(_):
            bi, bd = nn_bruteforce(query, target)
            return (
                tgt6(bi).reshape(t, tile_q, 6),
                bd.reshape(t, tile_q),
            )

        m_t, d_t = jax.lax.cond(
            n_bad_t2 > kmax, global_brute, lambda _: (m_t, d_t), None,
        )

    matched = m_t.reshape(n, 6)
    dist = d_t.reshape(n)
    if return_certified:
        if global_fallback:
            cert_q = jnp.ones((n,), bool)
        else:
            # Brute repair fixes the first kmax bad tiles in tile order
            # (stable compaction) — those rows are exact too.
            rank = jnp.cumsum(bad_tile2.astype(jnp.int32)) - 1
            tile_fixed = bad_tile2 & (rank < kmax)
            cert_q = (c_t | tile_fixed[:, None]).reshape(n)
        return (matched[:n_in, 0:3], matched[:n_in, 3:6], dist[:n_in],
                cert_q[:n_in])
    return matched[:n_in, 0:3], matched[:n_in, 3:6], dist[:n_in]


def make_pallas_nn(
    target_local: np.ndarray,
    resolution: int | None = None,
    trange: "int | None" = None,
    dtype=np.float32,
    with_normals: bool = False,
):
    """Build grid + (nn_fn, nn_state, resolution) for the ICP driver.

    ``trange=None`` sizes the slab range from the data (``auto_trange``,
    with the host build's historical extra headroom floor of 2048).
    ``with_normals=True`` estimates target normals (cell PCA) and packs
    them into the grids; the nn_fn then returns
    (matched, dist, normal) — the point-to-plane contract.
    """
    if resolution is None:
        resolution = auto_resolution_data(target_local)
    if trange is None:
        trange = max(auto_trange(target_local, resolution), 2048)

    normals = None
    normals_dev = None
    if with_normals:
        from iterativeclosestpoint_tpu.ops.normals import (
            estimate_normals_cellpca,
        )

        normals = estimate_normals_cellpca(target_local, resolution)
        normals_dev = jnp.asarray(normals, jnp.float32)

    grid = build_pallas_grid(
        target_local, resolution, trange=trange, dtype=np.float32,
        normals=normals,
    )
    # Second level: 4× coarser grid (certificate radius 4 fine cells) for
    # straggler repair; ranges are ~16× longer, hence the larger trange.
    coarse_resolution = max(resolution // 4, 8)
    coarse_trange = _COARSE_TRANGE_CAP
    coarse = build_pallas_grid(
        target_local, coarse_resolution, trange=coarse_trange,
        dtype=np.float32, normals=normals,
    )
    # The global all-pairs fallback is kept only where it is compilable
    # and affordable; beyond that the coarse level + budgeted brute repair
    # plus coarse-to-fine initialization covers exactness.
    global_fallback = len(target_local) <= 300_000
    state = (grid, coarse, normals_dev if with_normals else jnp.zeros((0,)))
    return (
        _pallas_fn(resolution, coarse_resolution, trange, coarse_trange,
                   global_fallback, with_normals),
        state,
        resolution,
    )


@functools.lru_cache(maxsize=None)
def _pallas_fn(resolution: int, coarse_resolution: int, trange: int,
               coarse_trange: int, global_fallback: bool,
               with_normals: bool = False, slabs: int = 6,
               tile_q: int = 128, fine: str = "sweep",
               xy_slots: int = 12):
    def fn(query, target, nn_state):
        grid, coarse, normals = nn_state
        m, nrm, d = nn_colsweep_exact(
            query, target, grid, coarse,
            normals if with_normals else None,
            resolution=resolution, coarse_resolution=coarse_resolution,
            trange=trange, coarse_trange=coarse_trange,
            global_fallback=global_fallback, slabs=slabs, tile_q=tile_q,
            fine=fine, xy_slots=xy_slots,
        )
        if with_normals:
            return m, d, nrm
        return m, d

    # The ICP driver reads these to build the matching query layout and
    # to validate the estimator against the packed grid contents.
    fn.tile_q = tile_q
    fn.with_normals = with_normals
    # The z-column kernel needs (x,y)-group-aligned tiles; the x-slab
    # sweep needs x-group alignment only.
    fn.layout_group = "xy" if fine == "zcol" else "x"
    return fn
