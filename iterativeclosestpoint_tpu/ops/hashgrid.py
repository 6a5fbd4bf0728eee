"""Voxel-hash grid 1-NN: the TPU-native replacement for the octree (C2).

The reference builds a pointer-based AABB octree over the target and runs
recursive best-first 1-NN queries per source point
(``PointCloudRegistration/core/octree.cpp:86-184``) — a structure a TPU
cannot execute. This module replaces it with the sorted voxel-hash design
(SURVEY.md §2 C2): target points are bucketed into an R³ grid, sorted by
cell id, and a query gathers the 27-neighborhood of its cell as
fixed-shape candidate tiles with masking.

Fixed shapes are achieved with two mechanisms:
  * per-cell candidate *capacity* K: a query reads at most the first K
    points of each neighbor cell (chosen at build time from the occupancy
    histogram, playing the role of the octree's leaf capacity,
    icpengine.h:17);
  * a global *overflow list*: every point beyond its cell's first K goes
    into one shared list that is brute-forced against all queries, so the
    candidate set is exactly "all points in the 27-neighborhood ∪ overflow"
    — no point can be silently missed.

Exactness: if the best candidate distance d ≤ cell_size and the query lies
inside the grid, the true nearest neighbor's cell is within ±1 cell per
axis, hence in the candidate set — the result is certified exact. The
per-iteration ICP driver uses ``nn_hybrid``: grid query + certificate; if
any query is uncertified (typical only in the first, badly-misaligned
iterations), one ``lax.cond`` falls back to exact brute force for that
iteration. Once aligned (NN distances ≪ cell size), every iteration is
served by the O(N) grid path.

Build runs on host (numpy): the target is static per registration
(icpengine.cpp:122 — octree built once; the source moves).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce

_BIG = 1.0e18


class HashGrid(NamedTuple):
    """Device-side grid state (a pytree of arrays; static meta rides in
    the jit closure via `resolution`/`capacity` kwargs)."""

    sorted_pts: jnp.ndarray  # (M, 3) target points sorted by cell id
    sorted_idx: jnp.ndarray  # (M,) original target index per sorted slot
    cell_start: jnp.ndarray  # (R³+1,) CSR offsets into sorted arrays
    overflow_pts: jnp.ndarray  # (O_pad, 3) points beyond per-cell capacity
    overflow_idx: jnp.ndarray  # (O_pad,) original indices (0 for padding)
    origin: jnp.ndarray  # (3,) grid origin (target AABB min)
    cell_size: jnp.ndarray  # () scalar


def choose_capacity(counts: np.ndarray, overflow_cap: int) -> int:
    """Smallest per-cell capacity K with total overflow ≤ overflow_cap."""
    if counts.size == 0:
        return 1
    hi = int(counts.max())
    lo = 1
    while lo < hi:
        mid = (lo + hi) // 2
        if np.maximum(counts - mid, 0).sum() <= overflow_cap:
            hi = mid
        else:
            lo = mid + 1
    return lo


def build_hashgrid(
    target: np.ndarray,
    resolution: int = 64,
    capacity: int | None = None,
    overflow_cap: int = 2048,
    dtype=np.float32,
):
    """Build the grid on host. Returns (HashGrid, capacity).

    ``target`` must be in the centered local frame (f64 in, stored as
    ``dtype``). ``resolution`` is cells per axis (static); cell size covers
    the AABB's largest extent.
    """
    target = np.asarray(target)
    m = len(target)
    R = resolution

    tmin = target.min(axis=0)
    tmax = target.max(axis=0)
    extent = float((tmax - tmin).max())
    cell = max(extent / R, 1e-9)

    coords = np.clip(((target - tmin) / cell).astype(np.int64), 0, R - 1)
    cid = (coords[:, 0] * R + coords[:, 1]) * R + coords[:, 2]

    order = np.argsort(cid, kind="stable")
    sorted_cid = cid[order]
    cell_start = np.searchsorted(sorted_cid, np.arange(R**3 + 1)).astype(np.int32)

    counts = np.diff(cell_start)
    occupied = counts[counts > 0]
    if capacity is None:
        capacity = choose_capacity(occupied, overflow_cap)

    # Rank of each sorted point within its cell; rank ≥ K → overflow.
    rank = np.arange(m) - cell_start[sorted_cid]
    over = order[rank >= capacity]
    o_pad = max(8, 1 << int(np.ceil(np.log2(max(len(over), 1)))))
    overflow_pts = np.full((o_pad, 3), 1e15, dtype)
    overflow_idx = np.zeros((o_pad,), np.int32)
    if len(over):
        overflow_pts[: len(over)] = target[over]
        overflow_idx[: len(over)] = over

    grid = HashGrid(
        sorted_pts=jnp.asarray(target[order], dtype),
        sorted_idx=jnp.asarray(order, jnp.int32),
        cell_start=jnp.asarray(cell_start),
        overflow_pts=jnp.asarray(overflow_pts),
        overflow_idx=jnp.asarray(overflow_idx),
        origin=jnp.asarray(tmin, dtype),
        cell_size=jnp.asarray(cell, dtype),
    )
    return grid, capacity


_NEIGHBOR_OFFSETS = np.stack(
    np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), axis=-1
).reshape(27, 3)


@functools.partial(jax.jit, static_argnames=("resolution", "capacity", "query_chunk"))
def nn_hashgrid(
    query: jnp.ndarray,
    grid: HashGrid,
    *,
    resolution: int,
    capacity: int,
    query_chunk: int = 65536,
):
    """Grid 1-NN for every query point.

    Returns (idx (N,) int32 original target indices, dist (N,),
    certified (N,) bool — True where the result is provably exact).
    """
    R = resolution
    K = capacity
    n = query.shape[0]
    m = grid.sorted_pts.shape[0]
    f = query.dtype
    big = jnp.asarray(_BIG, f)
    offs = jnp.asarray(_NEIGHBOR_OFFSETS, jnp.int32)

    qc = min(query_chunk, n)
    n_pad = -(-n // qc) * qc
    q = jnp.pad(query, ((0, n_pad - n), (0, 0)))

    def chunk_fn(q_chunk):
        qcell_f = (q_chunk - grid.origin) / grid.cell_size
        qcell = jnp.floor(qcell_f).astype(jnp.int32)
        inside = jnp.all((qcell >= 0) & (qcell < R), axis=1)
        qcell = jnp.clip(qcell, 0, R - 1)

        nb = qcell[:, None, :] + offs[None, :, :]  # (c, 27, 3)
        nb_ok = jnp.all((nb >= 0) & (nb < R), axis=-1)  # (c, 27)
        nb = jnp.clip(nb, 0, R - 1)
        cid = (nb[..., 0] * R + nb[..., 1]) * R + nb[..., 2]
        start = jnp.where(nb_ok, grid.cell_start[cid], 0)
        end = jnp.where(nb_ok, grid.cell_start[cid + 1], 0)

        def k_step(k, carry):
            best_d2, best_i = carry
            pos = start + k  # (c, 27)
            ok = pos < end
            pos_c = jnp.minimum(pos, m - 1)
            cand = grid.sorted_pts[pos_c]  # (c, 27, 3) gather
            diff = q_chunk[:, None, :] - cand
            d2 = jnp.sum(diff * diff, axis=-1)
            d2 = jnp.where(ok, d2, big)
            j = jnp.argmin(d2, axis=1)
            dmin = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
            slot = jnp.take_along_axis(pos_c, j[:, None], axis=1)[:, 0]
            imin = grid.sorted_idx[slot]
            take = dmin < best_d2
            return (
                jnp.where(take, dmin, best_d2),
                jnp.where(take, imin, best_i),
            )

        init = (jnp.full((q_chunk.shape[0],), big, f),
                jnp.zeros((q_chunk.shape[0],), jnp.int32))
        best_d2, best_i = jax.lax.fori_loop(0, K, k_step, init)
        return best_d2, best_i, inside

    d2, idx, inside = jax.lax.map(chunk_fn, q.reshape(-1, qc, 3))
    d2 = d2.reshape(n_pad)[:n]
    idx = idx.reshape(n_pad)[:n]
    inside = inside.reshape(n_pad)[:n]

    # Overflow pass: exact brute force against the shared overflow list.
    if grid.overflow_pts.shape[0] > 0:
        o_idx, o_dist = nn_bruteforce(query, grid.overflow_pts)
        o_d2 = o_dist * o_dist
        take = o_d2 < d2
        d2 = jnp.where(take, o_d2, d2)
        idx = jnp.where(take, grid.overflow_idx[o_idx], idx)

    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    certified = inside & (dist <= grid.cell_size)
    return idx, dist, certified


@functools.partial(jax.jit, static_argnames=("resolution", "capacity", "query_chunk"))
def nn_hybrid(
    query: jnp.ndarray,
    target: jnp.ndarray,
    grid: HashGrid,
    *,
    resolution: int,
    capacity: int,
    query_chunk: int = 65536,
):
    """Exact 1-NN: grid path when certified, brute-force fallback otherwise.

    The certificate is evaluated per iteration over all queries; the
    fallback (one ``lax.cond``) executes only when triggered — in practice
    the first iteration or two of a badly-misaligned pair.
    """
    idx, dist, certified = nn_hashgrid(
        query, grid, resolution=resolution, capacity=capacity,
        query_chunk=query_chunk,
    )
    all_ok = jnp.all(certified)

    def use_grid(_):
        return idx, dist

    def use_brute(_):
        return nn_bruteforce(query, target)

    return jax.lax.cond(all_ok, use_grid, use_brute, None)


def make_hashgrid_nn(target_local: np.ndarray, resolution: int = 64,
                     capacity: int | None = None, dtype=np.float32):
    """Build grid + return (nn_fn, nn_state) for the ICP driver.

    nn_fn(query, target, nn_state) -> (idx, dist).
    """
    grid, K = build_hashgrid(
        target_local, resolution=resolution, capacity=capacity, dtype=dtype
    )
    return _hybrid_fn(resolution, K), grid


@functools.lru_cache(maxsize=None)
def _hybrid_fn(resolution: int, capacity: int):
    # Cached so repeated registrations with the same grid meta reuse one
    # callable identity (jit static arg) and hence one compiled executable.
    return functools.partial(
        _hybrid_adapter, resolution=resolution, capacity=capacity
    )


@functools.partial(jax.jit, static_argnames=("resolution", "capacity"))
def _hybrid_adapter(query, target, grid, *, resolution, capacity):
    idx, dist = nn_hybrid(
        query, target, grid, resolution=resolution, capacity=capacity
    )
    return target[idx], dist
