"""Round-4 W5 measurement: multi-scan wall with pipelined edge fixed
costs (staged uploads + cached identity), plus a pose-quality gate the
round-3 experiment lacked."""

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
              tolerance=0.0, mode="gui")
    stats = {}
    t0 = time.perf_counter()
    out = register_scans(scans, stats=stats, **mk)
    log(f"warmup {time.perf_counter()-t0:.1f}s stats={stats} "
        f"rmse={[f'{er.rmse:.4f}' for er in out.edge_results]}")
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = register_scans(scans, stats={}, **mk)
        ts.append(time.perf_counter() - t0)
        log(f"run {i}: {ts[-1]:.3f}s")
    el = min(ts)
    n_edges = len(out.edge_results)
    total_src = sum(
        int(er.history_valid[0] + er.history_outliers[0])
        for er in out.edge_results if er.iterations
    )
    log(f"multi-scan pipelined: {el:.3f}s for {n_edges} edges x {ITERS} "
        f"iters, {total_src} edge-source pts -> "
        f"{total_src * ITERS / el:,.0f} pts/s")
    # Pose quality: every solved pose should be ~identity (the scans are
    # unperturbed windows of one world cloud + 1 cm noise).
    for s, T in enumerate(np.asarray(out.poses)):
        ang = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3]) - 1) / 2,
                                           -1, 1)))
        log(f"pose {s}: |t|={np.linalg.norm(T[:3,3]):.4f} m rot={ang:.4f} deg")


if __name__ == "__main__":
    main()
