"""Attribute the multi-scan wall (round-4): per-stage synced breakdown
of one register_scans run via the runtime.timing collector."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np


def main():
    import jax

    from iterativeclosestpoint_tpu.models.posegraph import register_scans
    from iterativeclosestpoint_tpu.runtime.timing import collect
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    print(f"devices: {jax.devices()}", flush=True)
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

    mk = dict(edges="auto", reuse_device=True, max_iterations=ITERS,
              tolerance=0.0, mode="gui")
    t0 = time.perf_counter()
    out = register_scans(scans, stats={}, **mk)
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)
    # Two synced passes (first warms drain-op compiles).
    with collect(sync=True):
        register_scans(scans, stats={}, **mk)
    with collect(sync=True) as col:
        t0 = time.perf_counter()
        out = register_scans(scans, stats={}, **mk)
        wall = time.perf_counter() - t0
    for line in col.lines():
        print("breakdown:", line, flush=True)
    print(f"synced wall {wall:.3f}s", flush=True)
    for er in out.edge_results:
        print(f"edge: iters={er.iterations} rmse={er.rmse:.4f} "
              f"valid0={er.history_valid[0]} "
              f"validN={er.history_valid[-1]}", flush=True)


if __name__ == "__main__":
    main()
