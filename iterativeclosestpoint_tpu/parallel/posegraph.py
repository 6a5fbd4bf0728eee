"""Distributed pose-graph Gauss-Newton: edges sharded over the mesh.

BASELINE.json config 5: "pose-graph optimization via distributed
Schur-complement, N≥2 hosts". Structure: each device owns a shard of the
edge set, computes its edges' residuals + exact Jacobians and their 6×6
normal-equation block contributions locally, and one ``psum`` over the
mesh produces the identical global (H, b) on every device; the (small,
dense, gauge-fixed) solve then runs replicated — the same
replicated-decision pattern as parallel/sharded.py, applied to the
edge-block reduction instead of point statistics.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from iterativeclosestpoint_tpu.models.posegraph import (
    PoseGraphResult,
    _edge_system,
)
from iterativeclosestpoint_tpu.ops.se3 import se3_exp
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh


def _accumulate(poses, ii, jj, Z_inv, w, n_var, ps):
    """Local edge systems → psum-reduced global (H, b, sq_sum, count)."""
    r, J_i, J_j = jax.vmap(_edge_system)(poses[ii], poses[jj], Z_inv, w)
    # Zero-weight padding edges contribute nothing (w folded in already).
    Hii = jnp.einsum("eri,erj->eij", J_i, J_i)
    Hij = jnp.einsum("eri,erj->eij", J_i, J_j)
    Hjj = jnp.einsum("eri,erj->eij", J_j, J_j)
    gi = jnp.einsum("eri,er->ei", J_i, r)
    gj = jnp.einsum("eri,er->ei", J_j, r)

    r6 = jnp.arange(6)
    H = jnp.zeros((n_var, n_var), poses.dtype)
    b = jnp.zeros((n_var,), poses.dtype)

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
    cnt = jnp.sum((w > 0).astype(poses.dtype)) * r.shape[-1]
    return ps(H), ps(b), ps(sq), ps(cnt)


@functools.partial(
    jax.jit, static_argnames=("n_poses", "max_iterations", "mesh")
)
def _solve_sharded(
    ii, jj, Z_inv, w, *, n_poses: int, max_iterations: int, damping,
    tolerance, mesh: Mesh,
):
    n_var = 6 * n_poses
    f = Z_inv.dtype

    def device_fn(ii_l, jj_l, Zl, wl):
        ps = lambda x: jax.lax.psum(x, "dp")

        def body(state):
            poses, it, done, rmse = state
            H, b, sq, cnt = _accumulate(poses, ii_l, jj_l, Zl, wl, n_var, ps)
            rmse = jnp.sqrt(sq / jnp.maximum(cnt, 1.0))
            Hf = H[6:, 6:] + damping * jnp.eye(n_var - 6, dtype=f)
            delta = jnp.linalg.solve(Hf, -b[6:])
            step = jnp.concatenate([jnp.zeros(6, f), delta]).reshape(n_poses, 6)
            poses = jax.vmap(lambda T, xi: T @ se3_exp(xi))(poses, step)
            done = jnp.max(jnp.abs(delta)) < tolerance
            return poses, it + 1, done, rmse

        def cond(state):
            _, it, done, _ = state
            return jnp.logical_and(it < max_iterations, ~done)

        poses0 = jnp.broadcast_to(jnp.eye(4, dtype=f), (n_poses, 4, 4))
        init = (poses0, jnp.asarray(0, jnp.int32), jnp.asarray(False),
                jnp.asarray(jnp.inf, f))
        return jax.lax.while_loop(cond, body, init)

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
    dtype=jnp.float64,
) -> PoseGraphResult:
    """Mesh-distributed variant of models.posegraph.optimize_pose_graph.

    Edges are zero-weight-padded to a device multiple and sharded; results
    are bit-identical across devices (all decisions flow from the psum)."""
    if mesh is None:
        mesh = make_mesh()
    d = mesh.devices.size
    E = len(edges)
    E_pad = max(d, -(-E // d) * d)

    ii = np.zeros(E_pad, np.int32)
    jj = np.zeros(E_pad, np.int32)
    Z_inv = np.tile(np.eye(4), (E_pad, 1, 1))
    w = np.zeros(E_pad)
    for e, (i, j, Z) in enumerate(edges):
        ii[e], jj[e] = i, j
        Z_inv[e] = np.linalg.inv(np.asarray(Z, np.float64))
        w[e] = 1.0 if weights is None else float(weights[e])
    # Padding edges: (0,0,I) with weight 0 — their Jacobian contributions
    # are scaled to zero inside _edge_system.

    poses, iters, done, rmse = _solve_sharded(
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(Z_inv, dtype),
        jnp.asarray(w, dtype), n_poses=n_poses,
        max_iterations=max_iterations, damping=jnp.asarray(damping, dtype),
        tolerance=jnp.asarray(tolerance, dtype), mesh=mesh,
    )
    return PoseGraphResult(
        poses=np.asarray(poses, np.float64),
        iterations=int(iters),
        residual_rmse=float(rmse),
        converged=bool(done),
    )
