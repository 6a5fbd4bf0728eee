"""Distributed pose-graph Gauss-Newton: edges sharded over the mesh.

BASELINE.json config 5: "pose-graph optimization via distributed
Schur-complement, N≥2 hosts". Structure: each device owns a shard of the
edge set, computes its edges' residuals + exact Jacobians and their 6×6
normal-equation block contributions locally, and one ``psum`` over the
mesh produces the identical global (H, b) on every device; the (small,
dense, gauge-fixed) solve then runs replicated — the same
replicated-decision pattern as parallel/sharded.py, applied to the
edge-block reduction instead of point statistics.

Round-4 (verdict W3) parity with the local solver
(models.posegraph.optimize_pose_graph):

  * **anchor conjugation** — the whole graph is conjugated by
    ``W = trans(anchor)`` on host before the solve and mapped back in
    f64 after, so UTM-frame measurements lose their ~|origin| lever arm
    (the mechanism models/posegraph.py:138-146 documents as load-bearing
    for f32 GN on device — TPU has no f64);
  * **IRLS robustness** — the same lagged huber/tukey reweighting, with
    the edge-residual median computed as the exact GLOBAL interpolated
    median across shards (two bit-pattern bisections through psum,
    models.icp._global_masked_kth) — zero-weight padding edges excluded;
  * **dtype default** — f64 under x64 (tests/oracles), f32 otherwise,
    exactly like the local solver;
  * non-finite-pose guard → explicit failure, never NaN poses.

``models.posegraph.register_scans(mesh=...)`` routes its pose-graph
solve here, so the distributed path is the production path, not a demo.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from iterativeclosestpoint_tpu.models.icp import _global_masked_kth
from iterativeclosestpoint_tpu.models.posegraph import (
    PoseGraphResult,
    _disconnected_from,
    _edge_system,
)
from iterativeclosestpoint_tpu.ops.se3 import se3_exp
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh


def _accumulate(r, J_i, J_j, ii, jj, w, n_var, dtype, ps):
    """Local edge systems → psum-reduced global (H, b, sq_sum, count)."""
    # Zero-weight padding edges contribute nothing (w folded in already).
    Hii = jnp.einsum("eri,erj->eij", J_i, J_i)
    Hij = jnp.einsum("eri,erj->eij", J_i, J_j)
    Hjj = jnp.einsum("eri,erj->eij", J_j, J_j)
    gi = jnp.einsum("eri,er->ei", J_i, r)
    gj = jnp.einsum("eri,er->ei", J_j, r)

    r6 = jnp.arange(6)
    H = jnp.zeros((n_var, n_var), dtype)
    b = jnp.zeros((n_var,), dtype)

    def blk(a, c):
        return (
            a[:, None, None] * 6 + r6[None, :, None],
            c[:, None, None] * 6 + r6[None, None, :],
        )

    H = H.at[blk(ii, ii)].add(Hii)
    H = H.at[blk(ii, jj)].add(Hij)
    H = H.at[blk(jj, ii)].add(jnp.swapaxes(Hij, 1, 2))
    H = H.at[blk(jj, jj)].add(Hjj)
    b = b.at[ii[:, None] * 6 + r6[None, :]].add(gi)
    b = b.at[jj[:, None] * 6 + r6[None, :]].add(gj)

    sq = jnp.sum(r * r)
    cnt = jnp.sum((w > 0).astype(dtype)) * r.shape[-1]
    return ps(H), ps(b), ps(sq), ps(cnt)


@functools.partial(
    jax.jit, static_argnames=("n_poses", "max_iterations", "mesh", "robust")
)
def _solve_sharded(
    ii, jj, Z_inv, w, *, n_poses: int, max_iterations: int, damping,
    tolerance, mesh: Mesh, robust: str = "none",
):
    n_var = 6 * n_poses
    f = Z_inv.dtype

    def device_fn(ii_l, jj_l, Zl, wl):
        ps = lambda x: jax.lax.psum(x, "dp")

        def body(state):
            poses, w_eff, it, done, rmse = state
            r, J_i, J_j = jax.vmap(_edge_system)(
                poses[ii_l], poses[jj_l], Zl, w_eff
            )
            H, b, sq, cnt = _accumulate(
                r, J_i, J_j, ii_l, jj_l, w_eff, n_var, f, ps
            )
            rmse = jnp.sqrt(sq / jnp.maximum(cnt, 1.0))
            if robust in ("huber", "tukey"):
                # Lagged IRLS, exactly as the local solver: the weights
                # updated from THIS iteration's residuals apply to the
                # NEXT iteration's system; activation after 3 plain GN
                # steps. Scale = the exact global interpolated median of
                # real-edge residual norms (two bisections — matches
                # jnp.median on one device bit-for-bit).
                rn = jnp.linalg.norm(r, axis=1) / jnp.sqrt(
                    jnp.maximum(w_eff, 1e-30)
                )
                valid = wl > 0
                cnt_e = ps(jnp.sum(valid, dtype=jnp.int32))
                k_lo = jnp.maximum(cnt_e - 1, 0) // 2
                k_up = cnt_e // 2
                med = (
                    _global_masked_kth(rn, valid, k_lo, ps)
                    + _global_masked_kth(rn, valid, k_up, ps)
                ) / 2.0
                scale = med + 1e-12
                if robust == "huber":
                    w_rob = jnp.minimum(
                        1.0, scale / jnp.maximum(rn, 1e-30)
                    )
                else:
                    c = 3.0 * scale
                    u = jnp.clip(rn / c, 0.0, 1.0)
                    w_rob = (1.0 - u * u) ** 2
                w_next = jnp.where(
                    it >= 3, wl * jnp.maximum(w_rob, 1e-12), w_eff
                )
            else:
                w_next = w_eff
            Hf = H[6:, 6:] + damping * jnp.eye(n_var - 6, dtype=f)
            delta = jnp.linalg.solve(Hf, -b[6:])
            step = jnp.concatenate([jnp.zeros(6, f), delta]).reshape(
                n_poses, 6
            )
            poses = jax.vmap(lambda T, xi: T @ se3_exp(xi))(poses, step)
            done = jnp.max(jnp.abs(delta)) < tolerance
            return poses, w_next, it + 1, done, rmse

        def cond(state):
            _, _, it, done, _ = state
            return jnp.logical_and(it < max_iterations, ~done)

        poses0 = jnp.broadcast_to(jnp.eye(4, dtype=f), (n_poses, 4, 4))
        init = (poses0, wl, jnp.asarray(0, jnp.int32), jnp.asarray(False),
                jnp.asarray(jnp.inf, f))
        poses, _, it, done, rmse = jax.lax.while_loop(cond, body, init)
        return poses, it, done, rmse

    return jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )(ii, jj, Z_inv, w)


def optimize_pose_graph_sharded(
    edges: Sequence[Tuple[int, int, np.ndarray]],
    n_poses: int,
    weights: Optional[Sequence[float]] = None,
    mesh: Optional[Mesh] = None,
    max_iterations: int = 20,
    tolerance: float = 1e-10,
    damping: float = 1e-8,
    dtype=None,
    anchor: Optional[np.ndarray] = None,
    robust: str = "none",
) -> PoseGraphResult:
    """Mesh-distributed variant of models.posegraph.optimize_pose_graph.

    Full API parity with the local solver (anchor conjugation, IRLS
    ``robust``, dtype defaulting — see module docstring); edges are
    zero-weight-padded to a device multiple and sharded; results are
    bit-identical across devices (every decision flows from psums)."""
    if robust not in ("none", "huber", "tukey"):
        raise ValueError(f"unknown robust mode {robust!r}")
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if mesh is None:
        mesh = make_mesh()
    k = n_poses
    E = len(edges)
    if E == 0:
        return PoseGraphResult(
            poses=np.broadcast_to(np.eye(4), (k, 4, 4)).copy(),
            iterations=0,
            residual_rmse=float("inf"),
            converged=False,
            disconnected=list(range(1, k)),
        )
    d = mesh.devices.size
    E_pad = max(d, -(-E // d) * d)

    W = np.eye(4)
    if anchor is not None:
        W[:3, 3] = np.asarray(anchor, np.float64)
    W_inv = np.eye(4)
    W_inv[:3, 3] = -W[:3, 3]

    ii = np.zeros(E_pad, np.int32)
    jj = np.zeros(E_pad, np.int32)
    Z_inv = np.tile(np.eye(4), (E_pad, 1, 1))
    w = np.zeros(E_pad)
    for e, (i, j, Z) in enumerate(edges):
        ii[e], jj[e] = i, j
        # Conjugated measurement (see the local solver): Z'⁻¹ = W⁻¹Z⁻¹W —
        # scene-scale translations when scans overlap near the anchor.
        Z_inv[e] = W_inv @ np.linalg.inv(np.asarray(Z, np.float64)) @ W
        w[e] = 1.0 if weights is None else float(weights[e])
    # Padding edges: (0,0,I) with weight 0 — their Jacobian contributions
    # are scaled to zero inside _edge_system.

    with jax.default_matmul_precision("highest"):  # TPU: no bf16 geometry
        poses, iters, done, rmse = _solve_sharded(
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(Z_inv, dtype),
            jnp.asarray(w, dtype), n_poses=n_poses,
            max_iterations=max_iterations,
            damping=jnp.asarray(damping, dtype),
            tolerance=jnp.asarray(tolerance, dtype), mesh=mesh,
            robust=robust,
        )
    poses_np = W @ np.asarray(poses, np.float64) @ W_inv
    res_rmse = float(rmse)
    converged = bool(done)
    if not np.isfinite(poses_np).all():
        res_rmse, converged = float("inf"), False
        poses_np = np.broadcast_to(np.eye(4), (k, 4, 4)).copy()
    return PoseGraphResult(
        poses=poses_np,
        iterations=int(iters),
        residual_rmse=res_rmse,
        converged=converged,
        disconnected=_disconnected_from(k, edges),
    )
