"""Pallas TPU kernel for grid 1-NN: the slab-sweep formulation.

This is the hot-loop-A kernel named in BASELINE.json ("Pallas kernels for
the NN-search … hot loops"), replacing the reference octree's per-query
recursive search (core/octree.cpp:128-184) with a memory-shaped design:

  * the target is sorted by linearized cell id (x-major) once per
    registration — build shared with ops/cellblock — and stored
    coordinate-transposed (3, M) so a *slab range* (one x-slab of the
    grid, y restricted to the tile's dilated span, all z) is one
    contiguous block of columns;
  * queries are Morton-sorted once on host (tile coherence survives rigid
    motion); each kernel program owns one tile of TILE_Q queries held in
    VMEM, computes nothing per query in HBM;
  * per program: ≤ SLABS async DMA copies bring the tile's candidate
    slabs into a double-buffered VMEM scratch (copy s+1 in flight while
    slab s is processed); the tile × slab distance matrix is evaluated
    densely on the VPU with row-validity masks; winning coordinates are
    extracted with a one-hot MXU contraction (no in-kernel gather) so the
    ICP driver never gathers by index afterwards;
  * coverage per tile = slabs [minx-1 … maxx+1] × y ∈ [miny-1 … maxy+1],
    full z — a superset of every query's 27-neighborhood, so a best
    distance ≤ cell_size certifies exactness (same argument as
    ops/cellblock); incomplete tiles (box or run caps exceeded) and
    far/outside queries are repaired exactly by budgeted brute-force
    passes, with a global fallback cond behind them.

Arithmetic is f32 throughout (coordinates are pre-centered by the f64
global offset; see models/icp.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
from iterativeclosestpoint_tpu.ops.cellblock import (
    auto_resolution_data,
    morton_order,
)

_BIG = 1.0e18
_FAR = 1.0e6  # padding coordinate: far but square-safe in f32


class PallasGrid(NamedTuple):
    tgt_t: jnp.ndarray       # (8, M + TRANGE) cell-sorted, transposed, padded
                             # (rows 0-2 = x,y,z; rows 3-7 pad — TPU sublane=8)
    cell_start: jnp.ndarray  # (R³+1,) CSR offsets
    origin: jnp.ndarray      # (3,)
    cell_size: jnp.ndarray   # ()


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
    tmin = target.min(axis=0)
    tmax = target.max(axis=0)
    cell = max(float((tmax - tmin).max()) / R, 1e-9)

    coords = np.clip(((target - tmin) / cell).astype(np.int64), 0, R - 1)
    cid = (coords[:, 0] * R + coords[:, 1]) * R + coords[:, 2]
    order = np.argsort(cid, kind="stable")
    cell_start = np.searchsorted(cid[order], np.arange(R**3 + 1)).astype(np.int32)

    tt = np.full((8, len(target) + trange), _FAR, dtype)
    tt[:3, : len(target)] = target[order].T
    if normals is not None:
        tt[3:6, :] = 0.0
        tt[3:6, : len(target)] = np.asarray(normals)[order].T

    return PallasGrid(
        tgt_t=jnp.asarray(tt),
        cell_start=jnp.asarray(cell_start),
        origin=jnp.asarray(tmin, dtype),
        cell_size=jnp.asarray(cell, dtype),
    )


def _colsweep_kernel(slabs: int, trange: int, tile_q: int, chunk: int = 2048):
    """Kernel factory. Each slab is processed in lane-chunks of ``chunk``
    so the (tile_q × chunk) distance/one-hot working set stays ~2 MB of
    VMEM even for long coarse-grid ranges."""
    n_chunks = -(-trange // chunk)

    def kernel(base_ref, start_ref, end_ref, q_ref, tgt_ref,
               out_ref, cand, sems):
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

        col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        oh_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_q, chunk), 1)

        for s in range(slabs):
            slot = s % 2
            if s + 1 < slabs:
                get_dma((s + 1) % 2, s + 1).start()
            get_dma(slot, s).wait()

            for k in range(n_chunks):
                c = cand[slot, :, k * chunk : (k + 1) * chunk]  # (8, chunk)
                rows = base_ref[i * slabs + s] + k * chunk + col  # (1, chunk)
                ok = (rows >= start_ref[i * slabs + s]) & (
                    rows < end_ref[i * slabs + s]
                )
                d2 = (
                    (qx[:, None] - c[0, :][None, :]) ** 2
                    + (qy[:, None] - c[1, :][None, :]) ** 2
                    + (qz[:, None] - c[2, :][None, :]) ** 2
                )
                d2 = jnp.where(ok, d2, big)
                j = jnp.argmin(d2, axis=1)  # (tile_q,)
                dmin = jnp.min(d2, axis=1)
                # Winner coordinates (and, rows 3-5, the winner's normal
                # when the grid packs normals) via one one-hot MXU
                # contraction — no gather.
                onehot = (oh_iota == j[:, None]).astype(jnp.float32)
                coords = jax.lax.dot_general(
                    onehot, c[0:6, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (tile_q, 6)
                take = dmin < best_d2
                best_d2 = jnp.where(take, dmin, best_d2)
                best_xyz = jnp.where(take[:, None], coords, best_xyz)

        # Single (8, tile_q) output block: rows 0-2 = matched xyz,
        # rows 3-5 = matched normal (zero unless packed), row 6 = d².
        out_ref[0, 0:6, :] = best_xyz.T
        out_ref[0, 6, :] = best_d2

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "tile_q", "slabs", "trange"),
)
def nn_colsweep(
    query: jnp.ndarray,
    grid: PallasGrid,
    *,
    resolution: int,
    tile_q: int = 128,
    slabs: int = 6,
    trange: int = 2048,
):
    """Slab-sweep grid 1-NN (Pallas).

    ``query``: (N, 3), Morton-sorted for coherence, any N (padded here by
    replicating the last row). Returns (matched (N,3), normal (N,3) —
    zeros unless the grid packs normals, dist (N,), certified (N,) bool).
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
    inside = jnp.all((qcell >= 0) & (qcell < R), axis=1)
    qcell = jnp.clip(qcell, 0, R - 1)

    qc_t = qcell.reshape(t, tile_q, 3)
    minc = jnp.min(qc_t, axis=1)  # (t, 3)
    maxc = jnp.max(qc_t, axis=1)

    # Slab s covers x = minx-1+s, y ∈ [miny-1, maxy+1], all z: one
    # contiguous row range [cell_start[(x·R+ylo)·R], cell_start[(x·R+yhi)·R+R]).
    s_ix = jnp.arange(slabs, dtype=jnp.int32)
    xs = minc[:, 0:1] - 1 + s_ix[None, :]          # (t, slabs)
    x_ok = (xs >= 0) & (xs < R) & (xs <= maxc[:, 0:1] + 1)
    xs_cl = jnp.clip(xs, 0, R - 1)
    y_lo = jnp.clip(minc[:, 1] - 1, 0, R - 1)[:, None]
    y_hi = jnp.clip(maxc[:, 1] + 1, 0, R - 1)[:, None]
    start = grid.cell_start[(xs_cl * R + y_lo) * R]
    end = grid.cell_start[(xs_cl * R + y_hi) * R + R]
    start = jnp.where(x_ok, start, 0)
    end = jnp.where(x_ok, end, 0)

    # Slab DMA bases are aligned down to 128 lanes (HBM tile granularity);
    # the fit margin accounts for up to 127 rows of alignment slack.
    slab_fit = (end - start) <= trange - 128  # (t, slabs)

    # Per-query certification (not per-tile): a query needs its own x±1
    # slabs present and within the range cap; y is always fully covered by
    # the dynamic [miny-1, maxy+1] span, z by the full column.
    sx = qc_t[..., 0] - (minc[:, 0:1] - 1)  # (t, tile_q) slab coord
    in_box = sx + 1 <= slabs - 1
    fit3 = jnp.ones_like(in_box)
    for dx in (-1, 0, 1):
        si = jnp.clip(sx + dx, 0, slabs - 1)
        fit3 &= jnp.take_along_axis(slab_fit, si, axis=1)
    query_complete = (in_box & fit3).reshape(n)

    base = jnp.minimum(start, m_rows - trange).astype(jnp.int32)
    base = (base // 128) * 128

    # Queries transposed per tile for the kernel: (t, 8, tile_q) with the
    # coordinate rows in 0-2 (sublane dim padded to 8 for TPU tiling).
    q_tiles = jnp.zeros((t, 8, tile_q), jnp.float32)
    q_tiles = q_tiles.at[:, 0:3, :].set(
        q32.reshape(t, tile_q, 3).transpose(0, 2, 1)
    )

    kernel = _colsweep_kernel(slabs, trange, tile_q)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, tile_q), lambda i, *refs: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, tile_q), lambda i, *refs: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, trange), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, 8, tile_q), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * t * slabs * tile_q * trange,
            bytes_accessed=t * slabs * trange * 12,
            transcendentals=0,
        ),
        # CPU test environments run the TPU kernel in interpreter mode.
        interpret=(jax.default_backend() != "tpu"),
    )(base.reshape(-1), start.reshape(-1), end.reshape(-1), q_tiles, grid.tgt_t)

    d2 = out[:, 6, :].reshape(n)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0)).astype(query.dtype)
    matched = out[:, 0:3, :].transpose(0, 2, 1).reshape(n, 3).astype(query.dtype)
    normal = out[:, 3:6, :].transpose(0, 2, 1).reshape(n, 3).astype(query.dtype)
    certified = inside & query_complete & (dist <= grid.cell_size)
    return matched[:n_in], normal[:n_in], dist[:n_in], certified[:n_in]


@functools.partial(
    jax.jit,
    static_argnames=(
        "resolution", "coarse_resolution", "tile_q", "slabs", "trange",
        "coarse_trange", "coarse_budget", "brute_batch", "brute_passes",
        "global_fallback",
    ),
)
def nn_colsweep_exact(
    query: jnp.ndarray,
    target: jnp.ndarray,
    grid: PallasGrid,
    coarse_grid: "PallasGrid | None" = None,
    target_normals: "jnp.ndarray | None" = None,
    *,
    resolution: int,
    coarse_resolution: int = 0,
    tile_q: int = 128,
    slabs: int = 6,
    trange: int = 2048,
    coarse_trange: int = 16384,
    coarse_budget: int = 16384,
    brute_batch: int = 4096,
    brute_passes: int = 16,
    global_fallback: bool = True,
):
    """Exact NN: fine kernel → coarse-kernel repair → budgeted brute →
    global cond fallback.

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

    Returns (matched (N,3), normal (N,3) — zeros when no normals, dist).
    """
    m3, nrm, dist, certified = nn_colsweep(
        query, grid, resolution=resolution, tile_q=tile_q, slabs=slabs,
        trange=trange,
    )
    matched = jnp.concatenate([m3, nrm], axis=1)  # (N, 6): xyz + normal
    n = query.shape[0]

    def tgt6(bi):
        bm = target[bi]
        if target_normals is not None:
            return jnp.concatenate([bm, target_normals[bi]], axis=1)
        return jnp.concatenate([bm, jnp.zeros_like(bm)], axis=1)

    if coarse_grid is not None and coarse_resolution:
        cb = min(coarse_budget, n)  # nn_colsweep pads to tiles internally
        perm0 = jnp.argsort(certified.astype(jnp.int32), stable=True)
        n_bad0 = jnp.sum(~certified, dtype=jnp.int32)
        rows = perm0[:cb]
        qc = query[rows]
        m_c, n_c, d_c, cert_c = nn_colsweep(
            qc, coarse_grid, resolution=coarse_resolution, tile_q=tile_q,
            slabs=slabs, trange=coarse_trange,
        )
        m_c6 = jnp.concatenate([m_c, n_c], axis=1)
        live = jnp.arange(cb, dtype=jnp.int32) < n_bad0
        upd = live & cert_c
        matched = matched.at[rows].set(
            jnp.where(upd[:, None], m_c6, matched[rows])
        )
        dist = dist.at[rows].set(jnp.where(upd, d_c, dist[rows]))
        certified = certified.at[rows].set(certified[rows] | upd)

    bad = ~certified
    n_bad = jnp.sum(bad, dtype=jnp.int32)
    B = brute_batch

    def repair(carry):
        m0, d0 = carry
        perm = jnp.argsort(certified.astype(jnp.int32), stable=True)
        q_perm = query[perm]
        n_pad = -(-n // B) * B
        if n_pad != n:
            q_perm = jnp.pad(q_perm, ((0, n_pad - n), (0, 0)))
            perm = jnp.pad(perm, (0, n_pad - n))

        def pass_body(p, c):
            mc, dc = c

            def do(_):
                qb = jax.lax.dynamic_slice(q_perm, (p * B, 0), (B, 3))
                rows = jax.lax.dynamic_slice(perm, (p * B,), (B,))
                # Large target tiles: few scan steps per repair pass.
                bi, bd = nn_bruteforce(
                    qb, target, query_chunk=B, target_tile=16384
                )
                bm = tgt6(bi)
                live = p * B + jnp.arange(B, dtype=jnp.int32) < n_bad
                return (
                    mc.at[rows].set(jnp.where(live[:, None], bm, mc[rows])),
                    dc.at[rows].set(jnp.where(live, bd, dc[rows])),
                )

            return jax.lax.cond(n_bad > p * B, do, lambda _: c, None)

        return jax.lax.fori_loop(0, brute_passes, pass_body, (m0, d0))

    matched, dist = jax.lax.cond(
        n_bad > 0, repair, lambda c: c, (matched, dist)
    )

    if global_fallback:
        def global_brute(_):
            bi, bd = nn_bruteforce(query, target)
            return tgt6(bi), bd

        matched, dist = jax.lax.cond(
            n_bad > brute_passes * B, global_brute,
            lambda _: (matched, dist), None,
        )
    return matched[:, 0:3], matched[:, 3:6], dist


def make_pallas_nn(
    target_local: np.ndarray,
    resolution: int | None = None,
    trange: int = 2048,
    dtype=np.float32,
    with_normals: bool = False,
):
    """Build grid + (nn_fn, nn_state, resolution) for the ICP driver.

    ``with_normals=True`` estimates target normals (cell PCA) and packs
    them into the grids; the nn_fn then returns
    (matched, dist, normal) — the point-to-plane contract.
    """
    if resolution is None:
        resolution = auto_resolution_data(target_local)

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
    coarse_trange = 16384
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
               with_normals: bool = False):
    def fn(query, target, nn_state):
        grid, coarse, normals = nn_state
        m, nrm, d = nn_colsweep_exact(
            query, target, grid, coarse,
            normals if with_normals else None,
            resolution=resolution, coarse_resolution=coarse_resolution,
            trange=trange, coarse_trange=coarse_trange,
            global_fallback=global_fallback,
        )
        if with_normals:
            return m, d, nrm
        return m, d

    return fn


def pallas_nn_adapter(query, target, nn_state):
    """Adapter when nn_state is a prebuilt PallasGrid with default meta."""
    raise NotImplementedError(
        "use make_pallas_nn(...) to construct the adapter with its grid"
    )
