"""Multi-scan joint registration: pairwise ICP edges + pose-graph
Gauss-Newton (BASELINE.json config 5).

The reference registers exactly one pair at a time; multi-scan surveys
(its own screenshots show sequential Scan_096 → Scan_099 pairs) have no
joint consistency mechanism. Here: each overlapping scan pair contributes
an SE(3) edge measured by pairwise ICP (models/icp.py); the absolute poses
are then estimated by Gauss-Newton on the pose graph, with per-edge 6×6
normal-equation blocks accumulated by reduction — the shape that
distributes as a ``psum`` over edge shards on a device mesh
(parallel/sharded.py pattern; each edge's (J_i, J_j, r) is independent).

Residual (right-perturbation convention):
    r_e(ξ) = Log( Z_e⁻¹ · (T_i Exp(ξ_i))⁻¹ · (T_j Exp(ξ_j)) )
with Z_e the ICP-measured relative transform taking scan i's frame to
scan j's (T_j ≈ T_i · Z_e). Jacobians are exact via forward-mode autodiff
at ξ = 0 — no hand-derived adjoints to get wrong. Pose 0 is the gauge.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.models.icp import ICPResult, icp_register
from iterativeclosestpoint_tpu.ops.se3 import se3_exp, se3_log


def _edge_residual(xi_i, xi_j, T_i, T_j, Z_inv):
    Ti = T_i @ se3_exp(xi_i)
    Tj = T_j @ se3_exp(xi_j)
    R = Ti[:3, :3]
    Ti_inv = jnp.eye(4, dtype=T_i.dtype)
    Ti_inv = Ti_inv.at[:3, :3].set(R.T)
    Ti_inv = Ti_inv.at[:3, 3].set(-R.T @ Ti[:3, 3])
    return se3_log(Z_inv @ (Ti_inv @ Tj))


def _highest(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped


@jax.jit
@_highest
def _edge_system(T_i, T_j, Z_inv, weight):
    """Per-edge residual + exact Jacobians at ξ=0 → (r, J_i, J_j) scaled."""
    z6 = jnp.zeros(6, T_i.dtype)
    r = _edge_residual(z6, z6, T_i, T_j, Z_inv)
    J_i = jax.jacfwd(_edge_residual, argnums=0)(z6, z6, T_i, T_j, Z_inv)
    J_j = jax.jacfwd(_edge_residual, argnums=1)(z6, z6, T_i, T_j, Z_inv)
    w = jnp.sqrt(weight)
    return r * w, J_i * w, J_j * w


@dataclasses.dataclass
class PoseGraphResult:
    poses: np.ndarray          # (k, 4, 4) absolute poses (pose 0 = identity)
    iterations: int
    residual_rmse: float       # final edge-residual RMS
    converged: bool
    edge_results: Optional[List[ICPResult]] = None
    # Scans with no successful-edge path to scan 0: their poses stay
    # identity and are NOT jointly estimated (every entry here means the
    # merged output would misplace that scan).
    disconnected: List[int] = dataclasses.field(default_factory=list)


def optimize_pose_graph(
    edges: Sequence[Tuple[int, int, np.ndarray]],
    n_poses: int,
    weights: Optional[Sequence[float]] = None,
    max_iterations: int = 20,
    tolerance: float = 1e-10,
    damping: float = 1e-8,
    dtype=None,
    anchor: Optional[np.ndarray] = None,
) -> PoseGraphResult:
    """Gauss-Newton over absolute poses given relative SE(3) measurements.

    Args:
      edges: (i, j, Z_ij) with T_j ≈ T_i · Z_ij.
      n_poses: number of scans k; pose 0 is fixed (gauge).
      dtype: GN arithmetic precision. ``None`` (default) picks f64 when
        ``jax_enable_x64`` is on (tests/oracles) and f32 otherwise — a CPU
        caller who wants f64 without flipping the global x64 flag should
        pass ``dtype=jnp.float64`` explicitly. f32 + ``anchor`` is
        accurate to ~1e-6 m at scene scale (tested); f32 *without* an
        anchor on UTM-frame inputs is not.
      anchor: a world point near the scans (e.g. scan 0's centroid). The
        whole graph is conjugated by ``W = trans(anchor)`` so every
        translation entry becomes scene-scale: UTM-frame measurements
        otherwise carry a ~|origin| lever arm in their translation
        (rotation about the far-away coordinate origin), which destroys
        the f32 GN on device — the same host-offset-centering scheme the
        ICP driver uses for coordinates (CLAUDE.md invariant). Solved
        poses are mapped back via ``T = W · T' · W⁻¹`` in f64 on host.
    """
    if dtype is None:
        # f64 when x64 is on (tests/oracles); otherwise f32 without the
        # per-op truncation warnings (TPU has no f64 anyway — edge
        # measurements are centered SE(3)s, well inside f32 range).
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    k = n_poses
    E = len(edges)
    if E == 0:
        # Nothing to estimate (e.g. every pairwise ICP edge failed):
        # identity poses, explicitly unconverged.
        return PoseGraphResult(
            poses=np.broadcast_to(np.eye(4), (k, 4, 4)).copy(),
            iterations=0,
            residual_rmse=float("inf"),
            converged=False,
            disconnected=list(range(1, k)),
        )
    if weights is None:
        weights = [1.0] * E
    ii = np.array([e[0] for e in edges])
    jj = np.array([e[1] for e in edges])
    W = np.eye(4)
    if anchor is not None:
        W[:3, 3] = np.asarray(anchor, np.float64)
    W_inv = np.eye(4)
    W_inv[:3, 3] = -W[:3, 3]
    # Conjugated measurement: Z' = W⁻¹ Z W, so Z'⁻¹ = W⁻¹ Z⁻¹ W; its
    # translation is the displacement of the anchor point under Z⁻¹ —
    # scene-scale by construction when scans overlap near the anchor.
    Z_inv = np.stack(
        [W_inv @ np.linalg.inv(np.asarray(e[2], np.float64)) @ W
         for e in edges]
    )
    w = np.asarray(weights, np.float64)

    poses = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (k, 4, 4))
    ii_j = jnp.asarray(ii)
    jj_j = jnp.asarray(jj)
    Zi = jnp.asarray(Z_inv, dtype)
    wj = jnp.asarray(w, dtype)

    edge_sys = jax.vmap(_edge_system)

    it_done = 0
    converged = False
    res_rmse = float("inf")
    with jax.default_matmul_precision("highest"):  # TPU: no bf16 geometry
        res_rmse, it_done, converged, poses = _gn_loop(
            max_iterations, edge_sys, poses, ii_j, jj_j, Zi, wj, k,
            dtype, damping, tolerance,
        )

    # Back to the world frame: T = W · T' · W⁻¹ (f64, host).
    poses_np = W @ np.asarray(poses, np.float64) @ W_inv
    if not np.isfinite(poses_np).all():
        # GN blew up (wildly inconsistent edges / singular system despite
        # damping): surface an explicit failure, never NaN poses.
        res_rmse, converged = float("inf"), False
        poses_np = np.broadcast_to(np.eye(4), (k, 4, 4)).copy()
    return PoseGraphResult(
        poses=poses_np,
        iterations=it_done,
        residual_rmse=res_rmse,
        converged=converged,
        disconnected=_disconnected_from(k, edges),
    )


def _gn_loop(
    max_iterations, edge_sys, poses, ii_j, jj_j, Zi, wj, k, dtype,
    damping, tolerance,
):
    it_done = 0
    converged = False
    res_rmse = float("inf")
    for it in range(max_iterations):
        r, J_i, J_j = edge_sys(poses[ii_j], poses[jj_j], Zi, wj)
        res_rmse = float(jnp.sqrt(jnp.mean(r**2)))

        # Accumulate 6×6 normal-equation blocks. (This einsum-style edge
        # reduction is the part a mesh shards with psum over edges.)
        n_var = 6 * k
        H = jnp.zeros((n_var, n_var), dtype)
        b = jnp.zeros((n_var,), dtype)

        Hii = jnp.einsum("eri,erj->eij", J_i, J_i)
        Hij = jnp.einsum("eri,erj->eij", J_i, J_j)
        Hjj = jnp.einsum("eri,erj->eij", J_j, J_j)
        gi = jnp.einsum("eri,er->ei", J_i, r)
        gj = jnp.einsum("eri,er->ei", J_j, r)

        r6 = jnp.arange(6)

        def blk_idx(a, b):
            return (
                a[:, None, None] * 6 + r6[None, :, None],
                b[:, None, None] * 6 + r6[None, None, :],
            )

        H = H.at[blk_idx(ii_j, ii_j)].add(Hii)
        H = H.at[blk_idx(ii_j, jj_j)].add(Hij)
        H = H.at[blk_idx(jj_j, ii_j)].add(jnp.swapaxes(Hij, 1, 2))
        H = H.at[blk_idx(jj_j, jj_j)].add(Hjj)
        b = b.at[ii_j[:, None] * 6 + r6[None, :]].add(gi)
        b = b.at[jj_j[:, None] * 6 + r6[None, :]].add(gj)

        # Gauge: drop pose 0's variables; LM-style damping for rank safety.
        Hf = H[6:, 6:] + damping * jnp.eye(n_var - 6, dtype=dtype)
        bf = b[6:]
        delta = jnp.linalg.solve(Hf, -bf)
        delta_full = jnp.concatenate([jnp.zeros(6, dtype), delta])

        step = delta_full.reshape(k, 6)
        poses = jax.vmap(lambda T, xi: T @ se3_exp(xi))(poses, step)
        it_done = it + 1
        if float(jnp.max(jnp.abs(delta))) < tolerance:
            converged = True
            break

    return res_rmse, it_done, converged, poses


def register_scans(
    scans: Sequence[np.ndarray],
    edges: Optional[Sequence[Tuple[int, int]]] = None,
    pose_graph_iterations: int = 20,
    **icp_kwargs,
) -> PoseGraphResult:
    """Joint multi-scan registration.

    Runs pairwise ICP on each edge (default: sequential chain) to measure
    relative transforms, weights each edge by its inlier count, then
    optimizes the pose graph. Returned poses map scan s into scan 0's
    frame: ``world_points = scan_s @ R.T + t`` with (R, t) from
    ``poses[s]``.
    """
    if edges is None:
        edges = [(s, s + 1) for s in range(len(scans) - 1)]

    measured = []
    weights = []
    edge_results = []
    for (i, j) in edges:
        # ICP maps scan j (source) onto scan i (target): P_i = T · P_j.
        res = icp_register(scans[j], scans[i], **icp_kwargs)
        edge_results.append(res)
        if not res.success:
            continue
        # T_i · Z = T_j with Z mapping j-frame to i-frame: Z = ICP result.
        measured.append((i, j, res.transform))
        weights.append(float(res.history_valid[-1]) if res.iterations else 1.0)

    out = optimize_pose_graph(
        measured, n_poses=len(scans), weights=weights,
        max_iterations=pose_graph_iterations,
        anchor=np.asarray(scans[0], np.float64).mean(axis=0),
    )
    out.edge_results = edge_results
    out.disconnected = _disconnected_from(len(scans), measured)
    return out


def _disconnected_from(k: int, measured) -> List[int]:
    """Scans with no successful-edge path to scan 0 (union-find)."""
    parent = list(range(k))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, j, _ in measured:
        parent[find(i)] = find(j)
    root0 = find(0)
    return [s for s in range(1, k) if find(s) != root0]
