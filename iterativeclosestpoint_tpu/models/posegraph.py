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


def detect_overlap_edges(
    scans: Sequence[np.ndarray],
    min_overlap: float = 0.25,
    resolution: int = 32,
    max_points: int = 200_000,
) -> List[Tuple[int, int]]:
    """Overlap-detected pose-graph edges (round-2 verdict W6: edges were
    chain-order only).

    Each scan is voxelized on a shared grid over the union bbox
    (``resolution`` cells on the longest axis); pair (i, j) becomes an
    edge when |occ_i ∩ occ_j| / min(|occ_i|, |occ_j|) ≥ ``min_overlap``.
    Occupancy intersection over a shared grid is robust where plain bbox
    intersection over-connects (long thin survey strips share bbox volume
    with strips they never touch). O(k²) pairs of sorted-array
    intersections — trivial beside one ICP edge.
    """
    scans = [np.asarray(s) for s in scans]
    lo = np.min([s.min(axis=0) for s in scans], axis=0)
    hi = np.max([s.max(axis=0) for s in scans], axis=0)
    cell = max(float((hi - lo).max()) / resolution, 1e-9)
    R = int(np.ceil((hi - lo).max() / cell)) + 1
    occ = []
    for s in scans:
        sub = s[:: max(1, len(s) // max_points)]
        c = np.clip(((sub - lo) / cell).astype(np.int64), 0, R - 1)
        occ.append(np.unique((c[:, 0] * R + c[:, 1]) * R + c[:, 2]))
    edges = []
    for i in range(len(scans)):
        for j in range(i + 1, len(scans)):
            inter = np.intersect1d(occ[i], occ[j], assume_unique=True)
            ov = len(inter) / max(min(len(occ[i]), len(occ[j])), 1)
            if ov >= min_overlap:
                edges.append((i, j))
    return edges


def optimize_pose_graph(
    edges: Sequence[Tuple[int, int, np.ndarray]],
    n_poses: int,
    weights: Optional[Sequence[float]] = None,
    max_iterations: int = 20,
    tolerance: float = 1e-10,
    damping: float = 1e-8,
    dtype=None,
    anchor: Optional[np.ndarray] = None,
    robust: str = "none",
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
    if robust not in ("none", "huber", "tukey"):
        # Same contract as icp_register: a typo like "hubert" must not
        # silently disable outlier-edge rejection (ADVICE r3).
        raise ValueError(f"unknown robust mode {robust!r}")
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
            dtype, damping, tolerance, robust,
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
    damping, tolerance, robust="none",
):
    it_done = 0
    converged = False
    res_rmse = float("inf")
    wj_eff = wj
    for it in range(max_iterations):
        r, J_i, J_j = edge_sys(poses[ii_j], poses[jj_j], Zi, wj_eff)
        res_rmse = float(jnp.sqrt(jnp.mean(r**2)))
        if robust in ("huber", "tukey") and it >= 3:
            # IRLS: downweight edges whose residual norm is an outlier
            # relative to the median — a single bad ICP edge (wrong
            # basin / low overlap) otherwise drags every pose. Activated
            # after 3 plain GN steps (at the identity start ALL residuals
            # are large and indistinguishable). Scale is the raw median —
            # the Gaussian consistency constant (1/0.6745) assumes many
            # degrees of freedom; on few-edge graphs it inflates the
            # scale past the outlier gap entirely (measured: the
            # textbook-constant Huber was an exact no-op on a 6-edge
            # graph with a 2.4 m corrupted edge). "huber" bounds the
            # outlier's influence (bias shrinks, never vanishes);
            # "tukey" (c = 3·median) is a redescender — the outlier's
            # weight reaches zero and the consistent subgraph is solved
            # exactly (measured 7.6e-11 pose error on the same graph).
            rn = jnp.linalg.norm(r, axis=1) / jnp.sqrt(
                jnp.maximum(wj_eff, 1e-30)
            )
            scale = jnp.median(rn) + 1e-12
            if robust == "huber":
                w_rob = jnp.minimum(1.0, scale / jnp.maximum(rn, 1e-30))
            else:
                c = 3.0 * scale
                u = jnp.clip(rn / c, 0.0, 1.0)
                w_rob = (1.0 - u * u) ** 2
            wj_eff = wj * jnp.maximum(w_rob, 1e-12)

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
    edges: "Sequence[Tuple[int, int]] | str | None" = None,
    pose_graph_iterations: int = 20,
    multiscale: bool = False,
    mesh=None,
    partition: bool = False,
    graph_robust: str = "none",
    reuse_device: "bool | str" = "auto",
    min_overlap: float = 0.25,
    crop_to_overlap: bool = True,
    crop_margin: float = 0.05,
    stats: Optional[dict] = None,
    **icp_kwargs,
) -> PoseGraphResult:
    """Joint multi-scan registration.

    Runs pairwise ICP on each edge to measure relative transforms,
    weights each edge by its inlier count, then optimizes the pose graph.
    Returned poses map scan s into scan 0's frame:
    ``world_points = scan_s @ R.T + t`` with (R, t) from ``poses[s]``.

    Args (round-2 verdict W6 — the production multi-scan surface):
      edges: explicit (i, j) pairs, ``None`` (sequential chain), or
        ``"auto"`` — occupancy-overlap detection (detect_overlap_edges).
      multiscale: run each edge through the coarse-to-fine pipeline
        (models/multiscale.py) — full-resolution edges at scale.
      mesh: device mesh; non-multiscale edges then run data-parallel
        (parallel.icp_register_sharded), multiscale edges shard their
        fine level.
      partition: with ``mesh``, run each edge with the TARGET spatially
        partitioned across the mesh (parallel.icp_register_partitioned)
        — the scan regime whose per-edge slab build exceeds the
        replicated path's memory envelope (round-3 verdict W6). The
        pose-invariant per-target prep (slab PartitionState + grid
        params, parallel.partition.prepare_partition) is cached across
        edges sharing a target, like the replicated path's grid cache.
      graph_robust: "huber" IRLS-downweights gross-outlier edges in the
        pose-graph solve (a wrong-basin ICP edge no longer drags every
        pose).
      reuse_device: upload each scan to the device ONCE and reuse it (and
        its NN grid factory) across every edge it appears in — N uploads
        instead of 2·edges. "auto": on for the single-device f32
        pallas-capable path; disabled under ``mesh``/multiscale (those
        manage their own device placement).
      crop_to_overlap: register each edge on the SOURCE points inside the
        target's bbox dilated by ``crop_margin``·extent (rigid transforms
        are valid for the whole scan, so the measured edge is unchanged).
        Documented deviation from plain pairwise semantics, default ON:
        partial-overlap edges otherwise flood the NN certificates with
        far out-of-bbox queries — measured 1.58 s/iteration (the repair
        safety net every iteration) vs ~35 ms cropped at 800k-point
        scans — and their 3σ statistics are dominated by points that
        have no true counterpart.
      stats: optional dict; gains {"scan_uploads", "grids_built",
        "cropped_source_uploads"} — the reuse contract's observables.

    NOTE: edge ICP runs default ``return_registered=False`` here (the
    merged cloud is recomputed from the solved poses; per-edge registered
    clouds would pull N×12 bytes per edge for nothing) — pass
    ``return_registered=True`` in icp kwargs if edge_results[].
    source_registered is wanted.
    """
    if partition and multiscale:
        raise ValueError(
            "partition=True cannot combine with multiscale=True (edges "
            "run the partitioned driver, which has no ladder; pass a "
            "coarse initial alignment through the edge kwargs instead)"
        )
    if partition and mesh is None:
        raise ValueError("partition=True requires a mesh")
    scans = [np.asarray(s, np.float64) for s in scans]
    if isinstance(edges, str):
        if edges != "auto":
            raise ValueError(f"unknown edges mode {edges!r}")
        edges = detect_overlap_edges(scans, min_overlap=min_overlap)
        if not edges:  # nothing overlaps enough — fall back to the chain
            edges = [(s, s + 1) for s in range(len(scans) - 1)]
    elif edges is None:
        edges = [(s, s + 1) for s in range(len(scans) - 1)]

    use_reuse = (
        reuse_device is True
        or (
            reuse_device == "auto"
            and mesh is None
            and not multiscale
            and icp_kwargs.get("dtype", jnp.float32) == jnp.float32
            and icp_kwargs.get("nn_backend", "auto") in ("auto", "pallas")
            and icp_kwargs.get("nn_fn") is None
            # Worthwhile only where the per-edge path would build device
            # grids anyway: on TPU (uploads/grids dominate per-edge fixed
            # cost) or when some edge exceeds the brute-force work bound
            # _default_nn's "auto" uses. Small-scan CPU graphs fall back
            # to the plain per-edge path (ADVICE r3: Pallas grid builds
            # in interpret mode cost more than they save there).
            and (
                jax.default_backend() == "tpu"
                or icp_kwargs.get("nn_backend", "auto") == "pallas"
                or any(
                    len(scans[i]) * len(scans[j]) > 2 ** 31
                    for (i, j) in edges
                )
            )
        )
    )

    device_scans = prepared = offset = None
    if use_reuse:
        import jax as _jax

        from iterativeclosestpoint_tpu.ops.pallas_nn import (
            make_pallas_nn_device,
        )

        # One shared centering frame for every scan (any consistent f64
        # offset is valid; the union-bbox center keeps all coordinates
        # scene-scale in f32).
        lo = np.min([s.min(axis=0) for s in scans], axis=0)
        hi = np.max([s.max(axis=0) for s in scans], axis=0)
        offset = (lo + hi) / 2.0
        local = [(s - offset).astype(np.float32) for s in scans]
        device_scans = {}
        prepared = {}
        with_normals = icp_kwargs.get("estimator", "point") == "plane"

        def target_dev(i):
            # Full scans ride the device lazily, once, in their TARGET
            # role (with cropping, sources upload per-edge subsets).
            if i not in device_scans:
                device_scans[i] = _jax.device_put(local[i])
                if stats is not None:
                    stats["scan_uploads"] = (
                        stats.get("scan_uploads", 0) + 1
                    )
            return device_scans[i]

        def prepared_for(i):
            if i not in prepared:
                prepared[i] = make_pallas_nn_device(
                    local[i], target_dev=target_dev(i),
                    with_normals=with_normals,
                )
                if stats is not None:
                    stats["grids_built"] = stats.get("grids_built", 0) + 1
            return prepared[i]

    # The pose graph needs only transforms/inlier counts per edge; the
    # registered clouds are recomputed from poses at merge time.
    icp_kwargs.setdefault("return_registered", False)

    bboxes = [(s.min(axis=0), s.max(axis=0)) for s in scans]

    def edge_source(i, j):
        """Source-j points for edge (i, j): cropped to target i's dilated
        bbox when crop_to_overlap (rigid edges are unchanged; the NN
        certificates and 3σ statistics see only plausibly-matching
        points)."""
        if not crop_to_overlap:
            return scans[j]
        lo_i, hi_i = bboxes[i]
        m = crop_margin * float((hi_i - lo_i).max())
        sel = np.all(
            (scans[j] >= lo_i - m) & (scans[j] <= hi_i + m), axis=1
        )
        sub = scans[j][sel]
        # Too little overlap to measure an edge — fall back to the full
        # scan (the 3σ gate + graph robustness absorb what it can).
        return sub if len(sub) >= 512 else scans[j]

    def _stage(i, j):
        """Host-crop edge (i, j) and enqueue its device transfers.

        Pure async device_puts, NO program dispatch: the grid-build
        dispatch stays deferred to the edge's own turn (the multiscale
        deferred-build discipline), so the in-flight edge's loop — whose
        inputs are already resident and whose remaining scalars are all
        device-cached — never queues behind these bulk uploads. Called
        for edge k+1 right before edge k's loop dispatch, the uploads
        ride the tunnel under edge k's device time (round-3 verdict W5:
        the 4×800k job spent ~4× its 2.2 s edge-loop device time on
        serially dispatched per-edge fixed costs).
        """
        from iterativeclosestpoint_tpu.runtime.timing import stage

        src_j = edge_source(i, j)
        if not use_reuse:
            return src_j, None
        nbytes = src_j.shape[0] * 12 + (
            0 if i in device_scans else local[i].nbytes
        )
        with stage("edge_stage", bytes=nbytes) as sync:
            src_dev = _jax.device_put((src_j - offset).astype(np.float32))
            if stats is not None:
                stats["cropped_source_uploads"] = (
                    stats.get("cropped_source_uploads", 0) + 1
                )
            tgt = target_dev(i)  # enqueue the full-target upload (cached)
            sync((src_dev, tgt))
        return src_j, src_dev

    measured = []
    weights = []
    edge_results = []
    prepared_partitions: dict = {}
    staged = _stage(*edges[0]) if edges else None
    for idx, (i, j) in enumerate(edges):
        # ICP maps scan j (source) onto scan i (target): P_i = T · P_j.
        src_j, src_dev = staged
        if use_reuse:
            kw = {k: v for k, v in icp_kwargs.items() if k != "nn_backend"}
            # Grid build for THIS edge dispatches now (its target upload
            # was staged earlier); then stage edge k+1's uploads before
            # the loop dispatch so they ride under the loop's compute.
            prep = prepared_for(i)
            if idx + 1 < len(edges):
                staged = _stage(*edges[idx + 1])
            res = icp_register(
                src_j, scans[i],
                device_data=(src_dev, target_dev(i), offset),
                prepared_nn=prep, **kw,
            )
        elif multiscale:
            from iterativeclosestpoint_tpu.models.multiscale import (
                icp_register_multiscale,
            )

            res = icp_register_multiscale(
                src_j, scans[i], mesh=mesh, **icp_kwargs
            ).final
        elif mesh is not None and partition:
            from iterativeclosestpoint_tpu.parallel.partition import (
                icp_register_partitioned,
                prepare_partition,
            )

            kw = {k: v for k, v in icp_kwargs.items()
                  if k != "nn_backend"}
            # Partition-tuning kwargs resolve at PREP time (they would
            # be silently ignored by icp_register_partitioned once a
            # prepared_partition is passed).
            pkw = {
                k: kw.pop(k)
                for k in ("halo", "local_search", "partition_build",
                          "fine_kernel")
                if k in kw
            }
            if i not in prepared_partitions:
                prepared_partitions[i] = prepare_partition(
                    scans[i], mesh=mesh,
                    estimator=icp_kwargs.get("estimator", "point"),
                    dtype=icp_kwargs.get("dtype", jnp.float32),
                    grid_resolution=icp_kwargs.get("grid_resolution"),
                    n_queries_hint=len(src_j), **pkw,
                )
                if stats is not None:
                    stats["partitions_built"] = (
                        stats.get("partitions_built", 0) + 1
                    )
            res = icp_register_partitioned(
                src_j, scans[i], mesh=mesh,
                prepared_partition=prepared_partitions[i], **kw,
            )
        elif mesh is not None:
            from iterativeclosestpoint_tpu.parallel.sharded import (
                icp_register_sharded,
            )

            res = icp_register_sharded(
                src_j, scans[i], mesh=mesh, **icp_kwargs
            )
        else:
            res = icp_register(src_j, scans[i], **icp_kwargs)
        if not use_reuse and idx + 1 < len(edges):
            staged = _stage(*edges[idx + 1])
        edge_results.append(res)
        if not res.success:
            continue
        # T_i · Z = T_j with Z mapping j-frame to i-frame: Z = ICP result.
        measured.append((i, j, res.transform))
        weights.append(float(res.history_valid[-1]) if res.iterations else 1.0)

    anchor = np.asarray(scans[0], np.float64).mean(axis=0)
    if mesh is not None:
        # Production routing for mesh runs (round-3 verdict W3): the
        # edge-sharded GN with the same anchor/IRLS mechanics as the
        # local solver (parallel/posegraph.py).
        from iterativeclosestpoint_tpu.parallel.posegraph import (
            optimize_pose_graph_sharded,
        )

        out = optimize_pose_graph_sharded(
            measured, n_poses=len(scans), weights=weights, mesh=mesh,
            max_iterations=pose_graph_iterations, anchor=anchor,
            robust=graph_robust,
        )
    else:
        out = optimize_pose_graph(
            measured, n_poses=len(scans), weights=weights,
            max_iterations=pose_graph_iterations, anchor=anchor,
            robust=graph_robust,
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
