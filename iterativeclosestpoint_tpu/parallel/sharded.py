"""Data-parallel ICP: source points sharded over a device mesh.

The TPU-native scaling strategy the reference lacks entirely (SURVEY.md §2
"parallelism strategies": two worker threads, nothing distributed): the
source cloud is sharded across chips along a 1-D ``dp`` mesh axis via
``shard_map``; the target (and its voxel grid) is replicated; every
per-iteration statistic — distance mean/σ, inlier counts, RMSE numerators
(icpengine.cpp:234-278), centroids and the 3×3 cross-covariance
(icpengine.cpp:82-90), or the 6×6 normal equations in plane mode — is
reduced with ``psum`` over ICI. All devices therefore step through
bit-identical convergence decisions, transforms and history records; only
the NN search and the element-wise mask work is parallel. Per iteration
the wire traffic is 84 bytes in point mode / 188 in plane mode (counted
from the compiled HLO and pinned by
tests/test_sharded.py::test_collective_payload_under_1kb), so scaling
efficiency is set by the NN kernel, not comms.

The loop body itself is ``models.icp.icp_core_impl`` — the same code as
the single-device path, with ``axis_name='dp'`` — and large runs reuse the
same segmented dispatcher (``models.icp._run_segmented``), so live
progress, cooperative stop, segment-boundary checkpoints, bit-identical
resume, and the ≥2M-point auto-segmentation watchdog guard all work
identically under the mesh.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.utils import hostmath
from jax.sharding import Mesh, PartitionSpec as P

from iterativeclosestpoint_tpu.models.icp import (
    ICPResult,
    _default_nn,
    _rebase_transform,
    _run_segmented,
    apply_permutation,
    icp_core_impl,
    package_result,
)
from iterativeclosestpoint_tpu.parallel.mesh import (
    make_mesh,
    mesh_dp_axes,
    pad_to_multiple,
    to_global,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nn_fn", "max_iterations", "widen_first", "mesh", "estimator",
        "robust",
    ),
)
def _icp_core_sharded(
    source,
    weight,
    target,
    nn_state,
    carry=None,
    *,
    nn_fn,
    max_iterations: int,
    tolerance,
    sigma_multiplier,
    widen_first: bool,
    mesh: Mesh,
    estimator: str = "point",
    robust: str = "none",
):
    # Shard/reduce over ALL mesh axes: a 1-D ("dp",) single-host mesh and
    # a 2-D ("host", "chip") DCN×ICI mesh run the same program — psum
    # accepts the axis tuple and XLA lowers the hierarchy.
    dp = mesh_dp_axes(mesh)

    def fn(src, w, tgt, state, carry_):
        return icp_core_impl(
            src, w, tgt, state,
            nn_fn=nn_fn,
            max_iterations=max_iterations,
            tolerance=tolerance,
            sigma_multiplier=sigma_multiplier,
            widen_first=widen_first,
            axis_name=dp,
            estimator=estimator,
            robust=robust,
            carry=carry_,
        )

    if carry is None:
        f = source.dtype
        carry = (
            jnp.eye(4, dtype=f),
            jnp.asarray(1e10, f),
            jnp.asarray(0, jnp.int32),
        )

    # Outputs: the transformed source stays sharded; scalars/history are
    # identical on every device (all decisions flow from psum-reduced
    # moments) and are emitted replicated.
    out_specs = {
        "src": P(dp),
        "T_cum": P(),
        "prev_error": P(),
        "no_improve": P(),
        "iter": P(),
        "stop": P(),
        "recorded": P(),
        "h_rmse": P(),
        "h_valid": P(),
        "h_out": P(),
        "h_T": P(),
        "h_mean": P(),
        "h_std": P(),
        "h_thr": P(),
    }
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(dp), P(dp), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )(source, weight, target, nn_state, carry)


def icp_register_sharded(
    source,
    target,
    *,
    mesh: Optional[Mesh] = None,
    max_iterations: int = 50,
    tolerance: float = 1e-6,
    sigma_multiplier: float = 3.0,
    mode: str = "gui",
    nn_backend: str = "auto",
    grid_resolution: Optional[int] = None,
    cell_capacity: Optional[int] = None,
    estimator: str = "point",
    robust: str = "none",
    initial_transform=None,
    dtype=jnp.float32,
    center: bool = True,
    return_registered: bool = True,
    segment_iterations: int = 0,
    progress_callback: Optional[Callable] = None,
    stop_event=None,
    resume_carry: Optional[dict | tuple] = None,
    segment_callback: Optional[Callable] = None,
    device_data=None,
    prepared_nn=None,
    source_global=None,
) -> ICPResult:
    """Multi-chip ICP registration (API mirror of models.icp.icp_register,
    including ``estimator``/``robust``, the segmented-dispatch surface
    (live progress, cooperative stop, checkpoints, bit-identical resume)
    and the overlapped device prep (``device_data``/``prepared_nn`` from
    ops.pallas_nn.make_pallas_nn_device — grids stay on device and are
    replicated over the mesh without a host round-trip; single-process
    meshes only).

    The source is padded to a device multiple with zero-weight rows (which
    no statistic ever sees) and sharded along the mesh's ``dp`` axis.

    ``source_global`` = (src_dev, weight_dev, n_rows) — an already-global
    row-sharded device source + 0/1 weight (parallel.ingest
    .load_las_sharded): per-host sharded ingest where no process ever
    held the full cloud. ``source`` is ignored (pass None); the NN
    structure is built from ``target`` alone and the query layout
    optimization is skipped (row order = file order; exactness is
    unaffected — uncertified tiles repair exactly).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if estimator not in ("point", "plane"):
        raise ValueError(f"unknown estimator {estimator!r}")

    if source_global is not None:
        if prepared_nn is not None or device_data is not None:
            raise ValueError(
                "source_global cannot combine with prepared_nn/device_data"
            )
        if initial_transform is not None:
            raise ValueError(
                "source_global with initial_transform is not supported "
                "(fold the pose into a resume_carry instead)"
            )
        n_orig = int(source_global[2])
    else:
        source = np.asarray(source, np.float64)
        n_orig = len(source)
    target = np.asarray(target, np.float64)
    T_init = None
    if initial_transform is not None:
        if resume_carry is not None:
            raise ValueError(
                "initial_transform cannot combine with resume_carry (the "
                "carry's transform already includes any initial pose)"
            )
        if device_data is not None:
            raise ValueError(
                "initial_transform with device_data: apply the transform "
                "to the device source instead (models/multiscale.py does)"
            )
        T_init = np.asarray(initial_transform, np.float64)
        source = source @ T_init[:3, :3].T + T_init[:3, 3]
    if device_data is not None:
        offset = np.asarray(device_data[2], np.float64)
    else:
        offset = (
            hostmath.center_offset(target)
            if center
            else np.zeros(3)
        )

    dp = mesh_dp_axes(mesh)
    row_weight = None
    nn_res = None  # resolved grid resolution (W2 observability)
    if source_global is not None:
        src_dev, w_dev = source_global[0], source_global[1]
        rows = None
        if nn_backend == "auto":
            nn_backend = (
                "bruteforce" if n_orig * len(target) <= 2 ** 31 else "pallas"
            )
        # NN structure from the target alone (the source is never on this
        # host in full); the query-layout permutation is skipped.
        nn_fn, nn_state, _r, _w, nn_res = _default_nn(
            nn_backend, np.zeros((1, 3)), target - offset, dtype,
            grid_resolution, cell_capacity, estimator,
        )
        tgt_dev = to_global((target - offset).astype(dtype), mesh, P())
        nn_state = jax.tree.map(
            lambda a: to_global(a, mesh, P()), nn_state
        )
    elif prepared_nn is not None:
        if jax.process_count() > 1:
            raise ValueError(
                "prepared_nn is single-process only (device-to-device "
                "resharding); multi-process runs use the host build path"
            )
        nn_fn, nn_state, resolution = prepared_nn
        nn_res = resolution
        if getattr(nn_fn, "with_normals", False) != (estimator == "plane"):
            raise ValueError(
                "prepared_nn normals do not match the estimator — rebuild "
                "the factory with with_normals accordingly"
            )
        from jax.sharding import NamedSharding

        from iterativeclosestpoint_tpu.ops.pallas_nn import (
            grouped_tile_order_device,
        )

        if device_data is not None:
            src_loc = device_data[0].astype(dtype)
            tgt_loc = device_data[1].astype(dtype)
        else:
            src_loc = jnp.asarray((source - offset).astype(dtype))
            tgt_loc = jnp.asarray((target - offset).astype(dtype))
        grid0 = nn_state[0]
        tq = getattr(nn_fn, "tile_q", 128)
        rows_d, lw = grouped_tile_order_device(
            src_loc, grid0.origin, grid0.cell_size, resolution=resolution,
            tile_q=tq, group=getattr(nn_fn, "layout_group", "x"),
        )
        # Pad so every dp shard is a whole number of query tiles.
        unit = tq * n_dev
        total = rows_d.shape[0]
        pad = (-total) % unit
        if pad:
            rows_d = jnp.concatenate(
                [rows_d, jnp.broadcast_to(rows_d[-1:], (pad,))]
            )
            lw = jnp.concatenate([lw, jnp.zeros((pad,), lw.dtype)])
        src_l = src_loc[rows_d]
        # Device-to-device resharding onto the mesh (no host round-trip).
        src_dev = jax.device_put(src_l, NamedSharding(mesh, P(dp)))
        w_dev = jax.device_put(
            lw.astype(dtype), NamedSharding(mesh, P(dp))
        )
        tgt_dev = jax.device_put(tgt_loc, NamedSharding(mesh, P()))
        nn_state = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), nn_state
        )
        rows = np.asarray(rows_d)
        row_weight = np.asarray(lw)
    else:
        src_np = source - offset
        nn_fn, nn_state, rows, row_weight, nn_res = _default_nn(
            nn_backend, src_np, target - offset, dtype,
            grid_resolution, cell_capacity, estimator,
        )
        if rows is not None:
            # Cell-sorted order also makes each device's shard spatially
            # compact (the dp shards inherit the tile layout).
            src_np = src_np[rows]
        src_pad, w = pad_to_multiple(src_np.astype(dtype), n_dev)
        if row_weight is not None:
            # Grouped-layout padding rows stay zero-weight under the
            # device padding too.
            w = w.copy()
            w[: len(row_weight)] = row_weight

        # Global device arrays: a plain put on one process; in
        # multi-process (jax.distributed) mode each process fills its
        # addressable shards from its full host copy — shard_map's
        # multi-controller contract.
        src_dev = to_global(src_pad, mesh, P(dp))
        w_dev = to_global(w, mesh, P(dp))
        tgt_dev = to_global((target - offset).astype(dtype), mesh, P())
        nn_state = jax.tree.map(
            lambda a: to_global(a, mesh, P()), nn_state
        )

    carry = None
    widen = mode == "gui"
    if resume_carry is not None:
        if isinstance(resume_carry, dict):
            T_w = resume_carry["transform"]
            pe = resume_carry["prev_error"]
            ni = resume_carry["no_improve"]
            T_l = resume_carry.get("transform_local")
            ck_off = resume_carry.get("offset")
        else:
            T_w, pe, ni = resume_carry
            T_l = ck_off = None
        if (
            T_l is not None
            and ck_off is not None
            and np.array_equal(np.asarray(ck_off, np.float64), offset)
        ):
            T_loc = np.asarray(T_l, np.float64)
        else:
            T_loc = _rebase_transform(np.asarray(T_w, np.float64), -offset)
        carry = (
            to_global(np.asarray(T_loc, dtype), mesh, P()),
            to_global(np.asarray(pe, dtype), mesh, P()),
            to_global(np.asarray(int(ni), np.int32), mesh, P()),
        )
        widen = False

    if not segment_iterations and n_orig >= 2_000_000:
        # Same TPU-worker watchdog guard as the single-device path
        # (models/icp.py): bound each device program to a few iterations.
        # Budgeted per-CHIP points — the mesh divides the work.
        per_chip = max(n_orig // max(n_dev, 1), 1)
        if per_chip >= 2_000_000:
            segment_iterations = max(2, int(8_000_000 // per_chip))

    def dispatch(carry_, seg_n, widen_):
        return _icp_core_sharded(
            src_dev, w_dev, tgt_dev, nn_state, carry_,
            nn_fn=nn_fn, max_iterations=seg_n, tolerance=tolerance,
            sigma_multiplier=sigma_multiplier, widen_first=widen_,
            mesh=mesh, estimator=estimator, robust=robust,
        )

    if segment_iterations and segment_iterations > 0:
        out = _run_segmented(
            dispatch, offset, src_dev.dtype,
            max_iterations=max_iterations,
            segment_iterations=segment_iterations,
            widen_first=widen,
            progress_callback=progress_callback,
            stop_event=stop_event,
            carry_init=carry,
            segment_callback=segment_callback,
        )
    else:
        out = dispatch(carry, max_iterations, widen)
    # Trim device-padding rows before packaging.
    out = dict(out)
    if jax.process_count() > 1:
        if return_registered:
            # The registered shard spans processes; gather it to every
            # host before the host-side trim/unpermute.
            from jax.experimental import multihost_utils

            out["src"] = multihost_utils.process_allgather(
                out["src"], tiled=True
            )
        else:
            del out["src"]
            out["src"] = None  # keyed but unused below
    out["src"] = (
        out["src"][: (len(rows) if rows is not None else n_orig)]
        if out["src"] is not None else None
    )
    res = package_result(out, offset, return_registered)
    res.nn_resolution = nn_res
    if rows is not None:
        res = apply_permutation(res, rows, row_weight, n_orig)
    if T_init is not None:
        res.transform = res.transform @ T_init
        res.history_transform = res.history_transform @ T_init
        # Local carry predates the composed-in initial pose.
        res.carry_transform_local = None
        res.center_offset = None
    return res
