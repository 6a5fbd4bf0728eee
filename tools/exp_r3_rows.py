"""Round-3 SCALING.md rows: (a) uniform-volume PARTITIONED run with the
per-slab z-column kernel vs the replicated zcol pipeline on the same
workload (verdict W3 done-criterion: within ~15%), (b) multi-scan
throughput with device residency (verdict W6 done-criterion: N uploads,
measured rate)."""

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

    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    log(f"devices: {jax.devices()}")
    N = 1_000_000
    ITERS = 20

    # ---- (a) volume regime: replicated vs partitioned ----
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="uniform", extent=100.0
    )
    kwargs = dict(
        coarse_max_points=30_000, coarse_iterations=15, max_iterations=ITERS,
        tolerance=0.0, dtype=jnp.float32, nn_backend="pallas",
        return_registered=False,
    )
    log("== replicated (auto kernel) warmup ==")
    t0 = time.perf_counter()
    r = icp_register_multiscale(src, tgt, **kwargs)
    log(f"warmup {time.perf_counter()-t0:.1f}s rmse={r.final.rmse:.4f}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = icp_register_multiscale(src, tgt, **kwargs)
        ts.append(time.perf_counter() - t0)
    el_rep = min(ts)
    log(f"replicated volume: {el_rep:.3f}s -> {N*ITERS/el_rep:,.0f} pts/s")

    log("== partitioned (1-chip mesh, per-slab kernel auto) warmup ==")
    pkw = dict(
        coarse_max_points=30_000, coarse_iterations=15, max_iterations=ITERS,
        tolerance=0.0, dtype=jnp.float32, fine_path="partitioned",
        return_registered=False,
    )
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    t0 = time.perf_counter()
    rp = icp_register_multiscale(src, tgt, mesh=mesh, **pkw)
    log(f"warmup {time.perf_counter()-t0:.1f}s rmse={rp.final.rmse:.4f} "
        f"iters={rp.final.iterations}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        rp = icp_register_multiscale(src, tgt, mesh=mesh, **pkw)
        ts.append(time.perf_counter() - t0)
    el_par = min(ts)
    log(f"partitioned volume: {el_par:.3f}s -> {N*ITERS/el_par:,.0f} pts/s "
        f"({el_par/el_rep:.2f}x replicated wall)")

    # ---- (b) multi-scan throughput with device residency ----
    from iterativeclosestpoint_tpu.models.posegraph import register_scans
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    k, n_scan = 4, 1_000_000
    world = make_cloud(int(k * n_scan / 2), seed=3, extent=200.0)
    x = world[:, 0]
    lo, hi = float(x.min()), float(x.max())
    ext = hi - lo
    rng = np.random.default_rng(0)
    scans = []
    for s in range(k):
        w_lo = lo + s * 0.2 * ext
        sel = world[(x >= w_lo) & (x <= w_lo + 0.4 * ext)]
        scans.append(sel + rng.normal(0, 0.01, sel.shape))
    log(f"scans: {[len(s) for s in scans]}")

    mk = dict(edges="auto", reuse_device=True, max_iterations=ITERS,
              tolerance=0.0, mode="gui")
    log("== multi-scan warmup ==")
    stats = {}
    t0 = time.perf_counter()
    out = register_scans(scans, stats=stats, **mk)
    log(f"warmup {time.perf_counter()-t0:.1f}s stats={stats} "
        f"edges={len(out.edge_results)} "
        f"rmse={[f'{er.rmse:.3f}' for er in out.edge_results]}")
    ts = []
    for _ in range(3):
        stats = {}
        t0 = time.perf_counter()
        out = register_scans(scans, stats=stats, **mk)
        ts.append(time.perf_counter() - t0)
    el = min(ts)
    total_pts = sum(len(scans[j]) for (i, j) in
                    [(0, 1), (1, 2), (2, 3)])  # approx source pts per edge
    n_edges = len(out.edge_results)
    log(f"multi-scan: {el:.3f}s for {n_edges} edges x {ITERS} iters, "
        f"stats={stats} -> "
        f"{sum(len(s) for s in scans) * 1.0:.0f} scan pts, "
        f"{total_pts * ITERS / el:,.0f} edge-source pts/s")


if __name__ == "__main__":
    main()
