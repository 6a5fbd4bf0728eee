"""Data-parallel ICP: source points sharded over a device mesh.

The TPU-native scaling strategy the reference lacks entirely (SURVEY.md §2
"parallelism strategies": two worker threads, nothing distributed): the
source cloud is sharded across chips along a 1-D ``dp`` mesh axis via
``shard_map``; the target (and its voxel grid) is replicated; every
per-iteration statistic — distance mean/σ, inlier counts, RMSE numerators
(icpengine.cpp:234-278), centroids and the 3×3 cross-covariance
(icpengine.cpp:82-90) — is reduced with ``psum`` over ICI. All devices
therefore step through bit-identical convergence decisions, transforms and
history records; only the NN search and the element-wise mask work is
parallel. Per iteration the wire traffic is four small psums (a dozen
scalars + a 3×3), so scaling efficiency is set by the NN kernel, not
comms.

The loop body itself is ``models.icp.icp_core_impl`` — the same code as
the single-device path, with ``axis_name='dp'``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from iterativeclosestpoint_tpu.models.icp import (
    ICPResult,
    _default_nn,
    apply_permutation,
    icp_core_impl,
    package_result,
)
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh, pad_to_multiple


@functools.partial(
    jax.jit,
    static_argnames=(
        "nn_fn", "max_iterations", "widen_first", "mesh", "robust",
    ),
)
def _icp_core_sharded(
    source,
    weight,
    target,
    nn_state,
    *,
    nn_fn,
    max_iterations: int,
    tolerance,
    sigma_multiplier,
    widen_first: bool,
    mesh: Mesh,
    robust: str = "none",
):
    fn = functools.partial(
        icp_core_impl,
        nn_fn=nn_fn,
        max_iterations=max_iterations,
        tolerance=tolerance,
        sigma_multiplier=sigma_multiplier,
        widen_first=widen_first,
        axis_name="dp",
        robust=robust,
    )

    # Outputs: the transformed source stays sharded; scalars/history are
    # identical on every device (all decisions flow from psum-reduced
    # moments) and are emitted replicated.
    out_specs = {
        "src": P("dp"),
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
        in_specs=(P("dp"), P("dp"), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )(source, weight, target, nn_state)


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
    dtype=jnp.float32,
    center: bool = True,
    return_registered: bool = True,
    robust: str = "none",
) -> ICPResult:
    """Multi-chip ICP registration (API mirror of models.icp.icp_register).

    The source is padded to a device multiple with zero-weight rows (which
    no statistic ever sees) and sharded along the mesh's ``dp`` axis.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size

    source = np.asarray(source, np.float64)
    target = np.asarray(target, np.float64)
    offset = (
        (target.min(axis=0) + target.max(axis=0)) / 2.0
        if center
        else np.zeros(3)
    )

    src_np = source - offset
    nn_fn, nn_state, rows, row_weight = _default_nn(
        nn_backend, src_np, target - offset, dtype,
        grid_resolution, cell_capacity,
    )
    if rows is not None:
        # Cell-sorted order also makes each device's shard spatially
        # compact (the dp shards inherit the tile layout).
        src_np = src_np[rows]
    src_pad, w = pad_to_multiple(src_np.astype(dtype), n_dev)
    if row_weight is not None:
        # Grouped-layout padding rows stay zero-weight under the device
        # padding too.
        w = w.copy()
        w[: len(row_weight)] = row_weight

    out = _icp_core_sharded(
        jnp.asarray(src_pad),
        jnp.asarray(w),
        jnp.asarray(target - offset, dtype),
        nn_state,
        nn_fn=nn_fn,
        max_iterations=max_iterations,
        tolerance=tolerance,
        sigma_multiplier=sigma_multiplier,
        widen_first=(mode == "gui"),
        mesh=mesh,
        robust=robust,
    )
    # Trim device-padding rows before packaging.
    out = dict(out)
    out["src"] = out["src"][: (len(rows) if rows is not None else len(source))]
    res = package_result(out, offset, return_registered)
    if rows is not None:
        res = apply_permutation(res, rows, row_weight, len(source))
    return res
