"""Round-5: per-iteration decertification census on the 1M bench fine
loop — how many tiles decertify per iteration, split tie vs distance.

CAVEAT (measured): this replay DISAGREES with the production trace —
replaying recorded poses counts 280-1400 dist-bad tiles/iter while the
compiled loop's own firing pattern (profiler trace, the shape of each
repair tier's kernel) shows n_bad0 <= 64 on nearly every iteration.
The recorded world-frame history composed back to the local frame does
not reproduce the loop's exact f32 query positions near certificate
edges (and jax.debug.print ground-truthing is unsupported over the
axon tunnel — no host callbacks). Trust the trace for firing counts;
use this tool only for orders of magnitude at cold poses."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.utils.hostmath import center_offset
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    N = 1_000_000
    ITERS = 20
    log(f"devices: {jax.devices()}")
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    kwargs = dict(
        coarse_max_points=30_000, coarse_iterations=15, max_iterations=ITERS,
        tolerance=0.0, dtype=jnp.float32, nn_backend="pallas",
        return_registered=False,
    )
    res = icp_register_multiscale(src, tgt, **kwargs)
    T_coarse = res.levels[0][1].transform
    h_T = res.final.history_transform  # world-frame per-iteration poses

    offset = center_offset(tgt)
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    slabs = 4
    R = pn.auto_resolution_data(tgtl, surface_boost_occupancy=32)
    trange = pn.auto_trange(tgtl, R)
    nn_fn, state, R = pn.make_pallas_nn_device(
        tgtl, resolution=R, trange=trange, slabs=slabs, target_dev=tgt_dev)
    grid = state[0]

    # Mirror the production fine level exactly: pristine loop source =
    # T_coarse applied in the local frame (initial_transform is folded
    # into the source — models/icp.py), layout built from it, and the
    # recorded history_transform values are RELATIVE to that start.
    W = np.eye(4); W[:3, 3] = offset
    Wi = np.eye(4); Wi[:3, 3] = -offset
    Tc_loc = (Wi @ np.asarray(T_coarse, np.float64) @ W).astype(np.float32)
    src_l = (src - offset).astype(np.float32)
    s0 = (src_l @ Tc_loc[:3, :3].T + Tc_loc[:3, 3]).astype(np.float32)
    rows, _ = pn.grouped_tile_order_device(
        jnp.asarray(s0), grid.origin, grid.cell_size, resolution=R)
    src_dev = jnp.asarray(s0)[rows]

    @jax.jit
    def census(T):
        q = src_dev @ T[:3, :3].T + T[:3, 3]
        m, nrm, d, cert, tie = pn.nn_colsweep(
            q, grid, resolution=R, slabs=slabs, trange=trange,
            fused=pn.use_fused_sweep(slabs, trange),
            chunk=pn.fused_sweep_chunk(slabs, trange), return_tie=True)
        t = len(cert) // 128
        c_t = cert.reshape(t, 128)
        tie_t = tie.reshape(t, 128)
        dist_bad = jnp.sum(jnp.any(~c_t & ~tie_t, axis=1))
        any_bad = jnp.sum(jnp.any(~c_t, axis=1))
        return (dist_bad, any_bad, jnp.sum(~cert), jnp.sum(tie))

    # Iteration k's QUERY pose: identity for k=0, else the recorded
    # relative transform after iteration k (local frame).
    poses = [np.eye(4, dtype=np.float32)] + [
        (Wi @ np.asarray(h_T[k], np.float64) @ W).astype(np.float32)
        for k in range(len(h_T))
    ]
    for k, T_loc in enumerate(poses):
        db, ab, nq, nt = [int(x) for x in census(jnp.asarray(T_loc))]
        log(f"query pose {k:2d}: dist-bad tiles {db:4d}  any-bad {ab:4d}  "
            f"uncert queries {nq:5d} (ties {nt:4d})")


if __name__ == "__main__":
    main()
