"""Coarse-to-fine multiscale ICP.

The reference copes with large clouds by *destructively* downsampling
(CLI stride-50, icp_registration.cpp:857; ``PointCloud::downsample``,
core/pointcloud.cpp:107-128) — it registers 2% of the data and discards
the rest. The principled TPU replacement (SURVEY.md §5 "long-context"
axis; BASELINE.json config 4): a coarse pass on a stride subsample
estimates the bulk of the SE(3), then full-resolution passes refine it.

This composition is also what makes the grid NN backends fast at scale:
after the coarse pass the residual misalignment is far below the fine
grid's cell size, so every fine iteration stays on the certified
slab-sweep path (ops/pallas_nn.py) and never pays the brute-force
fallback that a cold 2.5 m misalignment would force.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.models.icp import ICPResult, icp_register
from iterativeclosestpoint_tpu.runtime.timing import scope, stage
from iterativeclosestpoint_tpu.utils.hostmath import center_offset


@dataclasses.dataclass
class MultiscaleResult:
    """Fine-level result plus the per-level trail."""

    final: ICPResult
    levels: list  # [(stride, ICPResult), ...] coarse → fine

    @property
    def transform(self) -> np.ndarray:
        return self.final.transform

    @property
    def rmse(self) -> float:
        return self.final.rmse

    @property
    def success(self) -> bool:
        return self.final.success


def icp_register_multiscale(
    source,
    target,
    *,
    strides: Optional[Sequence[int]] = None,
    coarse_max_points: int = 30_000,
    coarse_iterations: int = 20,
    coarse_tolerance: float = 1e-4,
    dtype=jnp.float32,
    mesh=None,
    fine_path: str = "auto",
    initial_transform: Optional[np.ndarray] = None,
    **fine_kwargs,
) -> MultiscaleResult:
    """Register via a stride pyramid; the fine level gets every point.

    Args:
      strides: explicit pyramid, e.g. (16, 4, 1); default = one coarse
        level with stride ceil(N / coarse_max_points) then full res.
      coarse_*: iteration budget/tolerance for the non-final levels.
      mesh: optional device mesh — the full-resolution level then runs
        data-parallel (parallel.icp_register_sharded); coarse levels are
        small and stay single-device.
      fine_path: "auto" (sharded iff mesh given, else single-device),
        "partitioned" (fine level = parallel.icp_register_partitioned:
        the target sharded into x-slabs over the mesh — the production
        composition for targets beyond per-chip HBM; the ladder's coarse
        transform pre-aligns the partition layout).
      fine_kwargs: forwarded to the final full-resolution registration
        (nn_backend, max_iterations, tolerance, mode, ...).
    """
    if fine_path not in ("auto", "partitioned"):
        raise ValueError(f"unknown fine_path {fine_path!r}")
    source = np.asarray(source, np.float64)
    target = np.asarray(target, np.float64)
    n = len(source)
    coarse_nn_backend = fine_kwargs.pop("coarse_nn_backend", "auto")
    overlap_prep = fine_kwargs.pop("overlap_device_prep", True)

    if strides is None:
        s = max(1, -(-n // coarse_max_points))
        # Deep pyramids for very large clouds: each level must start
        # within its own NN grid's cell size or the certified fast path
        # degrades into per-iteration repair (and, at 10M+, device
        # programs long enough to trip the worker watchdog). sqrt-spaced
        # intermediate levels keep every level's residual misalignment
        # below the next level's cell size.
        ladder = [s]
        while ladder[-1] > 64:
            ladder.append(max(2, int(round(ladder[-1] ** 0.5))))
        strides = tuple(ladder) + (1,) if s > 1 else (1,)
    if strides[-1] != 1:
        strides = tuple(strides) + (1,)

    # Overlapped fine-level prep: the fine pass needs the full-resolution
    # clouds on device and a grid NN factory built over the target — none
    # of which depends on the coarse result. Start the uploads and the
    # (async-dispatched) device grid builds NOW so they ride the
    # host<->device link while the coarse pass computes; the fine call
    # then applies the coarse transform on device instead of re-uploading
    # a transformed copy (reference contrast: octree rebuilt from scratch
    # per run, icp_registration.cpp:857ff).
    device_data = prepared_nn = coarse_device = deferred_prep = None
    fine_backend = fine_kwargs.get("nn_backend", "auto")
    import jax as _jax

    if (
        overlap_prep
        and fine_path != "partitioned"  # builds its own per-slab grids
        and (mesh is None or _jax.process_count() == 1)
        and len(strides) > 1
        and dtype == jnp.float32
        and fine_kwargs.get("nn_fn") is None
        and (
            fine_backend == "pallas"
            or (fine_backend == "auto" and n * len(target) > 2 ** 31)
        )
    ):
        import jax

        from iterativeclosestpoint_tpu.ops.pallas_nn import (
            make_pallas_nn_device,
        )

        with stage("host_prep"):
            offset = (
                center_offset(target)
                if fine_kwargs.get("center", True)
                else np.zeros(3)
            )
            src_local = (source - offset).astype(np.float32)
            tgt_local = (target - offset).astype(np.float32)

        # Coarse-first upload order: the device transfer queue is FIFO, so
        # anything the coarse pass needs must be enqueued BEFORE the 24 MB
        # of full-resolution uploads or the coarse pass stalls behind them
        # (measured: coarse done at 0.62 s queued after vs 0.12 s queued
        # before — the overlap this block exists for only happens in the
        # second order). Prebuild the coarse NN factory here too: its grid
        # buffers ride the same early slot instead of being lazily
        # uploaded at coarse dispatch time (which would queue them late).
        import os as _os

        if (
            jax.default_backend() == "tpu"
            and coarse_nn_backend in ("auto", "bruteforce")
            and initial_transform is None
            and _os.environ.get("ICP_COARSE_FIRST", "1") == "1"
        ):
            csrc = src_local[:: strides[0]]
            ctgt = tgt_local[:: strides[0]]
            if len(csrc) * len(ctgt) <= 2 ** 31 and len(ctgt) <= 131072:
                from iterativeclosestpoint_tpu.ops.pallas_nn import (
                    make_pallas_brute,
                )

                with stage("coarse_upload", bytes=csrc.nbytes + ctgt.nbytes):
                    c_src_dev = jax.device_put(np.ascontiguousarray(csrc))
                    c_tgt_dev = jax.device_put(np.ascontiguousarray(ctgt))
                    nn_fn_c, grid_c = make_pallas_brute(ctgt)
                    grid_c = jax.tree.map(jax.device_put, grid_c)
                coarse_device = (c_src_dev, c_tgt_dev, offset, nn_fn_c,
                                 grid_c)

        with stage("upload", bytes=src_local.nbytes + tgt_local.nbytes) as done:
            src_dev = jax.device_put(src_local)
            tgt_dev = jax.device_put(tgt_local)
            done((src_dev, tgt_dev))
        with stage("grid_est"):
            # Host estimator passes now (~110 ms of pure numpy that rides
            # under the uploads); the DEVICE grid build is deferred until
            # after the first coarse level — device programs execute in
            # dispatch order, so a grid build dispatched here would make
            # the coarse loop wait for the full target upload.
            from iterativeclosestpoint_tpu.ops.pallas_nn import (
                estimate_grid_params,
            )

            grid_est = estimate_grid_params(
                tgt_local, fine_kwargs.get("grid_resolution")
            )
            # Two-stage boosted fine level (round 5, plane mode): when
            # the surface boost is refused by the 32 pts/cell occupancy
            # gate but the cloud still clears a 16 pts/cell floor, the
            # boosted grid is SAFE once the pose is converged — the
            # gate protects the LADDER HANDOFF, not the kernel
            # (tools/exp_10m_handoff.py, 10M terrain: R=512 sustains
            # 43M pts/s at the converged pose vs 27.6M at R=256, while
            # a cold handoff into 0.195 m cells collapses). Plane mode
            # converges to noise level, so its fine level runs a short
            # stage at the base resolution first, then switches to the
            # boosted grid (resume_carry + layout_transform keep it one
            # logical registration). Point mode is excluded: its pose
            # on smooth terrain stalls ABOVE the boosted cell size
            # (reference-faithful), so the boosted stage would start
            # outside its cells every time.
            boost2_est = None
            if (
                fine_kwargs.get("estimator", "point") == "plane"
                and mesh is None
                and fine_kwargs.get("grid_resolution") is None
            ):
                R_e, tr_e, ct_e, base_e, z_e = grid_est
                if R_e == base_e and z_e is None and tr_e < 2048:
                    from iterativeclosestpoint_tpu.ops.cellblock import (
                        surface_boost_ok,
                    )

                    if surface_boost_ok(tgt_local, 2 * base_e,
                                        occupancy=16):
                        from iterativeclosestpoint_tpu.ops.pallas_nn import (
                            auto_coarse_trange,
                            auto_trange,
                        )

                        boost2_est = (
                            2 * base_e,
                            auto_trange(tgt_local, 2 * base_e),
                            auto_coarse_trange(tgt_local, 2 * base_e),
                            base_e,
                            None,
                        )
        deferred_prep = (make_pallas_nn_device, tgt_local, tgt_dev, grid_est,
                         boost2_est)
        fine_kwargs.setdefault("nn_backend", "pallas")
        device_data = (src_dev, tgt_dev, offset)

    T = (
        np.asarray(initial_transform, np.float64)
        if initial_transform is not None
        else None
    )
    levels = []
    for li, stride in enumerate(strides):
        last = li == len(strides) - 1
        prepared_nn2 = None
        if last and deferred_prep is not None:
            # The coarse loop has been dispatched (and completed); the
            # fine grid's device build now queues behind nothing but the
            # in-flight target upload.
            with stage("grid_build") as done:
                (make_dev, tgt_local_, tgt_dev_, grid_est_,
                 boost2_est_) = deferred_prep
                with_n = fine_kwargs.get("estimator", "point") == "plane"
                prepared_nn = make_dev(
                    tgt_local_,
                    target_dev=tgt_dev_,
                    with_normals=with_n,
                    # grid_est_ already honors a forced grid_resolution
                    # (estimate_grid_params(target, resolution)).
                    est=grid_est_,
                )
                if boost2_est_ is not None:
                    prepared_nn2 = make_dev(
                        tgt_local_,
                        target_dev=tgt_dev_,
                        with_normals=with_n,
                        est=boost2_est_,
                    )
                done(prepared_nn[1])
        with scope("fine" if last else f"coarse{li}" if li else "coarse"):
            res = _run_level(
                last, stride, source, target, T, dtype, mesh, fine_path,
                fine_kwargs, device_data, prepared_nn, coarse_iterations,
                coarse_tolerance, coarse_nn_backend,
                coarse_device if li == 0 else None,
                prepared_nn2=prepared_nn2,
            )
        levels.append((stride, res))
        T = res.transform
        if not res.success:
            break

    return MultiscaleResult(final=levels[-1][1], levels=levels)


# Stage-1 length of the two-stage boosted fine level: enough plane
# iterations to converge the pose well inside the boosted cell size
# (plane reaches noise level in ~5 on the measured workloads; the
# boosted stage then runs certified — tools/exp_10m_handoff.py).
_BOOST2_PRE_ITERATIONS = 5


def _run_level(
    last, stride, source, target, T, dtype, mesh, fine_path, fine_kwargs,
    device_data, prepared_nn, coarse_iterations, coarse_tolerance,
    coarse_nn_backend, coarse_device=None, prepared_nn2=None,
):
    """One pyramid level (split out so each level is a timing scope)."""
    if not last:
        extra = {}
        if coarse_device is not None and T is None:
            # Pre-uploaded coarse inputs + prebuilt brute factory (their
            # transfers were enqueued BEFORE the full-resolution uploads,
            # so this level runs while those still ride the tunnel).
            c_src, c_tgt, c_off, nn_fn_c, grid_c = coarse_device
            extra = dict(
                device_data=(c_src, c_tgt, c_off),
                nn_fn=nn_fn_c,
                nn_state=grid_c,
            )
        return icp_register(
            source[::stride],
            target[::stride],
            dtype=dtype,
            initial_transform=T,
            max_iterations=coarse_iterations,
            tolerance=coarse_tolerance,
            nn_backend=coarse_nn_backend,
            mode=fine_kwargs.get("mode", "gui"),
            return_registered=False,
            **extra,
        )
    if fine_path == "partitioned":
        from iterativeclosestpoint_tpu.parallel.partition import (
            icp_register_partitioned,
        )

        allowed = (
            "halo", "repair_budget", "repair_passes",
            "max_iterations", "tolerance", "sigma_multiplier",
            "mode", "estimator", "robust", "local_search",
            "partition_build", "fine_kernel", "grid_resolution", "center",
            "return_registered", "segment_iterations",
            "progress_callback", "stop_event", "segment_callback",
        )
        pk = {k: v for k, v in fine_kwargs.items() if k in allowed}
        # Route nn_backend to the partitioned per-slab search backend
        # (round-2 verdict W3: it was silently dropped).
        nb = fine_kwargs.get("nn_backend", "auto")
        if nb and nb != "auto" and "local_search" not in pk:
            ls = {"pallas": "pallas", "bruteforce": "brute"}.get(nb)
            if ls is None:
                raise ValueError(
                    f"nn_backend={nb!r} has no partitioned equivalent "
                    "(use 'auto', 'pallas' or 'bruteforce')"
                )
            pk["local_search"] = ls
        return icp_register_partitioned(
            source, target, mesh=mesh, dtype=dtype,
            initial_transform=T, **pk,
        )
    if mesh is not None:
        from iterativeclosestpoint_tpu.parallel.sharded import (
            icp_register_sharded,
        )

        # Sharded path has no initial_transform arg: pre-apply.
        src_fine = source
        if T is not None:
            src_fine = source @ T[:3, :3].T + T[:3, 3]
        dd = device_data
        if dd is not None and T is not None:
            # The prebuilt device source predates the coarse
            # transform; apply it on device (local frame).
            from iterativeclosestpoint_tpu.models.icp import (
                _apply_transform_jit,
                _rebase_transform,
            )

            T_loc = _rebase_transform(T, -dd[2])
            src_dev = _apply_transform_jit(
                jnp.asarray(T_loc, jnp.float32), dd[0]
            )
            dd = (src_dev, dd[1], dd[2])
        res = icp_register_sharded(
            src_fine, target, mesh=mesh, dtype=dtype,
            device_data=dd, prepared_nn=prepared_nn,
            **fine_kwargs,
        )
        if T is not None:
            res.transform = res.transform @ T
            res.history_transform = res.history_transform @ T
            # Magnitudes follow the composed transforms (see icp.py's
            # T_init composition).
            trc = np.trace(res.history_transform[:, :3, :3],
                           axis1=1, axis2=2)
            res.history_rotation_deg = np.degrees(
                np.arccos(np.clip((trc - 1) / 2, -1, 1))
            )
            res.history_translation = np.linalg.norm(
                res.history_transform[:, :3, 3], axis=1
            )
            # Local carry misses the composed-in coarse transform.
            res.carry_transform_local = None
            res.center_offset = None
        return res
    K = _BOOST2_PRE_ITERATIONS
    mi = fine_kwargs.get("max_iterations", 50)
    if prepared_nn2 is None or mi <= K:
        return icp_register(
            source, target, dtype=dtype, initial_transform=T,
            device_data=device_data, prepared_nn=prepared_nn,
            **fine_kwargs,
        )

    # Two-stage boosted fine level: K iterations at the base resolution
    # converge the pose inside the boosted cell size, then the loop
    # continues on the boosted grid through resume_carry (exact
    # convergence-state carry) with the query layout rebuilt at the
    # stage-boundary pose (layout_transform — the carry holds the pose,
    # so the source itself stays raw). One logical registration: the
    # histories concatenate, callbacks see consecutive iteration
    # numbers, and an early stop in stage 1 simply IS the result.
    fk1 = dict(fine_kwargs, max_iterations=K, return_registered=False)
    res1 = icp_register(
        source, target, dtype=dtype, initial_transform=T,
        device_data=device_data, prepared_nn=prepared_nn, **fk1,
    )
    from iterativeclosestpoint_tpu.models.icp import MAX_ITERATIONS

    if res1.stop_reason != MAX_ITERATIONS:
        # Converged/stopped inside stage 1 — stage 2 would add nothing.
        if fine_kwargs.get("return_registered", True):
            Tw = np.asarray(res1.transform)
            res1.source_registered = (
                np.asarray(source, np.float64) @ Tw[:3, :3].T + Tw[:3, 3]
            )
        return res1

    fk2 = dict(fine_kwargs, max_iterations=mi - K)
    pc = fine_kwargs.get("progress_callback")
    if pc is not None:
        fk2["progress_callback"] = (
            lambda rec: pc({**rec, "iteration": rec["iteration"] + K})
        )
    sc = fine_kwargs.get("segment_callback")
    if sc is not None:
        fk2["segment_callback"] = (
            lambda st: sc({**st, "iteration": st["iteration"] + K})
        )
    res2 = icp_register(
        source, target, dtype=dtype,
        device_data=device_data, prepared_nn=prepared_nn2,
        resume_carry={
            "transform": res1.transform,
            "prev_error": res1.carry_prev_error,
            "no_improve": res1.carry_no_improve,
        },
        layout_transform=res1.transform,
        **fk2,
    )
    res2.iterations += res1.iterations
    for f in ("history_rmse", "history_valid", "history_outliers",
              "history_transform", "history_rotation_deg",
              "history_translation", "history_mean_dist",
              "history_std_dist", "history_threshold"):
        setattr(res2, f, np.concatenate(
            [getattr(res1, f), getattr(res2, f)], axis=0
        ))
    return res2
