"""Round-5: plane-mode multi-scan strip edges. SCALING recommends
estimator="plane" for real strip surveys (the point-mode edges slide
~9.2 m on this periodic terrain, bit-faithful to the reference), but
only point-mode edge timings exist. Measure register_scans with
estimator="plane" on the exp_ms3 workload: wall, per-edge pose (|t|
should be ~0 instead of the slide), and edge-loop throughput."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    from iterativeclosestpoint_tpu.models.posegraph import register_scans
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    log(f"devices: {jax.devices()}")
    ITERS = 20
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
              tolerance=0.0, mode="gui", estimator="plane")
    stats = {}
    t0 = time.perf_counter()
    out = register_scans(scans, stats=stats, **mk)
    log(f"warmup {time.perf_counter()-t0:.1f}s stats={stats} "
        f"rmse={[f'{er.rmse:.4f}' for er in out.edge_results]}")
    for i, er in enumerate(out.edge_results):
        t = np.asarray(er.transform)[:3, 3]
        log(f"edge {i}: |t| = {np.linalg.norm(t):.4f} m "
            f"(point-mode slid ~9.2 m here)")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = register_scans(scans, stats={}, **mk)
        ts.append(time.perf_counter() - t0)
    el = min(ts)
    n_edges = len(out.edge_results)
    total_src = sum(
        int(er.history_valid[0] + er.history_outliers[0])
        for er in out.edge_results if er.iterations
    )
    log(f"multi-scan PLANE: {el:.3f}s for {n_edges} edges x {ITERS} "
        f"iters, {total_src} edge-source pts -> "
        f"{total_src * ITERS / el:,.0f} pts/s")


if __name__ == "__main__":
    main()
