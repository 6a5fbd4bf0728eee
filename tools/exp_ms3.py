"""Validate the multi-pass coarse repair: multi-scan edge throughput
(was 63.9 s storm mode) + a headline-terrain guard (must stay ~1.37 s)."""

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
    from iterativeclosestpoint_tpu.models.posegraph import register_scans
    from iterativeclosestpoint_tpu.utils.synth import (
        make_cloud,
        make_registration_pair,
    )

    log(f"devices: {jax.devices()}")
    ITERS = 20

    # Headline guard first (same workload as bench.py).
    src, tgt, _ = make_registration_pair(
        n=1_000_000, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    kwargs = dict(
        coarse_max_points=30_000, coarse_iterations=15, max_iterations=ITERS,
        tolerance=0.0, dtype=jnp.float32, nn_backend="pallas",
        return_registered=False,
    )
    t0 = time.perf_counter()
    r = icp_register_multiscale(src, tgt, **kwargs)
    log(f"terrain warmup {time.perf_counter()-t0:.1f}s rmse={r.final.rmse:.4f}")
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        icp_register_multiscale(src, tgt, **kwargs)
        ts.append(time.perf_counter() - t0)
        log(f"terrain run {i}: {ts[-1]:.3f}s")
    log(f"terrain blended min {min(ts):.3f}s -> "
        f"{1_000_000*ITERS/min(ts):,.0f} pts/s")

    # Multi-scan with cropping + multi-pass coarse repair.
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
    log(f"multiscan warmup {time.perf_counter()-t0:.1f}s stats={stats} "
        f"rmse={[f'{er.rmse:.4f}' for er in out.edge_results]}")
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
    log(f"multi-scan (cropped, multipass-coarse): {el:.3f}s for {n_edges} "
        f"edges x {ITERS} iters, {total_src} edge-source pts -> "
        f"{total_src * ITERS / el:,.0f} pts/s")


if __name__ == "__main__":
    main()
