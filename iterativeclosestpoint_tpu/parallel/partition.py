"""Spatially partitioned target: each device owns an x-slab + halo.

The replicated-target data-parallel path (parallel/sharded.py) caps out
when the target no longer fits per-device HBM. This module implements the
SURVEY.md §5/§7 design: the target is partitioned into x-range slabs by
point-count quantiles (balanced), each device holding its slab plus a
halo of width h; Morton-ordered source shards are spatially compact, so
almost every query's neighborhood is local.

Exactness per query is certified by a *margin* argument: if the best
local distance d satisfies d ≤ distance(query, halo x-limits), the true
nearest neighbor's x lies inside this device's halo range, so it was in
the searched set — no slab-membership bookkeeping needed, and the
certificate survives source drift across iterations. Uncertified queries
(budgeted per device) are repaired collectively: one ``all_gather``
broadcasts them, every device searches its own slab, and a
``pmin``/``psum`` combine selects the global winner — the halo-exchange
analog of ring-attention's KV pass (SURVEY.md §5).

The per-device local search is the exact brute-force pass over the slab
(MXU matmul form); plugging the Pallas slab-sweep kernel underneath is a
local change since the NN contract returns matched coordinates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from iterativeclosestpoint_tpu.models.icp import (
    ICPResult,
    icp_core_impl,
    package_result,
)
from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh, pad_to_multiple

_FAR = 1.0e6


class PartitionState(NamedTuple):
    halo_pts: jnp.ndarray   # (D, M_loc, 3) per-device slab+halo (far-padded)
    x_lo: jnp.ndarray       # (D,) halo lower x-limit per device
    x_hi: jnp.ndarray       # (D,) halo upper x-limit per device


def build_partition(
    target: np.ndarray, n_dev: int, halo: float, dtype=np.float32
) -> PartitionState:
    """Host-side: x-quantile slabs + halo, padded to a common size."""
    target = np.asarray(target)
    qs = np.quantile(target[:, 0], np.linspace(0, 1, n_dev + 1))
    qs[0], qs[-1] = -np.inf, np.inf

    chunks = []
    los = np.empty(n_dev)
    his = np.empty(n_dev)
    for d in range(n_dev):
        lo = qs[d] - halo
        hi = qs[d + 1] + halo
        sel = target[(target[:, 0] >= lo) & (target[:, 0] < hi)]
        chunks.append(sel)
        los[d] = lo
        his[d] = hi
    m_loc = max(len(c) for c in chunks)
    m_loc = -(-m_loc // 128) * 128
    buf = np.full((n_dev, m_loc, 3), _FAR, dtype)
    for d, c in enumerate(chunks):
        buf[d, : len(c)] = c
    return PartitionState(
        halo_pts=jnp.asarray(buf),
        x_lo=jnp.asarray(los, dtype),
        x_hi=jnp.asarray(his, dtype),
    )


def _partitioned_nn(repair_budget: int, axis_name: str):
    """NN closure for icp_core_impl: local slab search + collective repair."""

    def nn(query, target_local, state):
        halo, x_lo, x_hi = state  # local: (M_loc,3), (), ()
        del target_local
        idx, dist = nn_bruteforce(query, halo)
        matched = halo[idx]

        # Margin certificate: best distance within reach of the halo walls.
        margin = jnp.minimum(query[:, 0] - x_lo, x_hi - query[:, 0])
        certified = dist <= margin
        bad = ~certified
        n_bad = jnp.sum(bad, dtype=jnp.int32)
        any_bad = jax.lax.psum(n_bad, axis_name) > 0

        def repair(carry):
            matched0, dist0 = carry
            K = min(repair_budget, query.shape[0])
            perm = jnp.argsort(certified.astype(jnp.int32), stable=True)
            rows = perm[:K]
            q_bad = query[rows]
            live = jnp.arange(K, dtype=jnp.int32) < n_bad

            # Halo exchange: everyone sees everyone's problem queries.
            q_all = jax.lax.all_gather(q_bad, axis_name)  # (D, K, 3)
            D = q_all.shape[0]
            qa = q_all.reshape(D * K, 3)
            li, ld = nn_bruteforce(qa, halo)
            lm = halo[li]
            ld2 = ld * ld
            gd2 = jax.lax.pmin(ld2, axis_name)
            win = (ld2 <= gd2).astype(query.dtype)
            wins = jax.lax.psum(win, axis_name)
            gm = jax.lax.psum(lm * win[:, None], axis_name) / jnp.maximum(
                wins, 1.0
            )[:, None]
            gd = jnp.sqrt(jnp.maximum(gd2, 0.0))

            # Extract this device's segment and scatter into local slots.
            rank = jax.lax.axis_index(axis_name)
            z = jnp.zeros((), rank.dtype)
            seg_m = jax.lax.dynamic_slice(gm, (rank * K, z), (K, 3))
            seg_d = jax.lax.dynamic_slice(gd, (rank * K,), (K,))
            return (
                matched0.at[rows].set(
                    jnp.where(live[:, None], seg_m, matched0[rows])
                ),
                dist0.at[rows].set(jnp.where(live, seg_d, dist0[rows])),
            )

        # All devices enter the collective branch together (any_bad is
        # psum-derived, hence identical everywhere).
        matched, dist = jax.lax.cond(
            any_bad, repair, lambda c: c, (matched, dist)
        )
        return matched, dist

    return nn


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "widen_first", "repair_budget", "mesh"),
)
def _icp_core_partitioned(
    source, weight, part: PartitionState, *,
    max_iterations: int, tolerance, sigma_multiplier, widen_first: bool,
    repair_budget: int, mesh: Mesh,
):
    nn = _partitioned_nn(repair_budget, "dp")

    def device_fn(src, w, halo, x_lo, x_hi):
        dummy_target = jnp.zeros((1, 3), src.dtype)
        return icp_core_impl(
            src, w, dummy_target, (halo[0], x_lo[0], x_hi[0]),
            nn_fn=nn, max_iterations=max_iterations, tolerance=tolerance,
            sigma_multiplier=sigma_multiplier, widen_first=widen_first,
            axis_name="dp",
        )

    out_specs = {k: P() for k in (
        "T_cum", "prev_error", "no_improve", "iter", "stop", "recorded",
        "h_rmse", "h_valid", "h_out", "h_T", "h_mean", "h_std", "h_thr",
    )}
    out_specs["src"] = P("dp")
    return jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=out_specs,
        check_vma=False,
    )(source, weight, part.halo_pts, part.x_lo, part.x_hi)


def icp_register_partitioned(
    source,
    target,
    *,
    mesh: Optional[Mesh] = None,
    halo: Optional[float] = None,
    repair_budget: int = 1024,
    max_iterations: int = 50,
    tolerance: float = 1e-6,
    sigma_multiplier: float = 3.0,
    mode: str = "gui",
    dtype=jnp.float32,
    center: bool = True,
    return_registered: bool = True,
) -> ICPResult:
    """ICP with the target spatially partitioned across the mesh.

    ``halo`` defaults to 2% of the cloud extent — generous against
    expected post-coarse correspondence distances; widen it (or run a
    coarse alignment first) for badly misaligned pairs.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size

    source = np.asarray(source, np.float64)
    target = np.asarray(target, np.float64)
    offset = (
        (target.min(axis=0) + target.max(axis=0)) / 2.0
        if center else np.zeros(3)
    )
    tgt_local = target - offset
    src_local = source - offset
    if halo is None:
        halo = 0.02 * float((tgt_local.max(0) - tgt_local.min(0)).max())

    # Sort source by x so equal-count shards line up with the target's
    # x-quantile slabs (the clouds nearly coincide after coarse alignment);
    # residual mismatch is absorbed by the halo + collective repair.
    perm = np.argsort(src_local[:, 0], kind="stable")
    src_sorted = src_local[perm]
    part = build_partition(tgt_local, n_dev, halo, dtype=dtype)

    src_pad, w = pad_to_multiple(src_sorted.astype(dtype), n_dev)
    out = _icp_core_partitioned(
        jnp.asarray(src_pad), jnp.asarray(w), part,
        max_iterations=max_iterations, tolerance=tolerance,
        sigma_multiplier=sigma_multiplier, widen_first=(mode == "gui"),
        repair_budget=repair_budget, mesh=mesh,
    )
    out = dict(out)
    out["src"] = out["src"][: len(source)]
    res = package_result(out, offset, return_registered)
    if res.source_registered is not None:
        unperm = np.empty_like(res.source_registered)
        unperm[perm] = res.source_registered
        res.source_registered = unperm
    return res
