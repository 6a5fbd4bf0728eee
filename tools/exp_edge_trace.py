"""Trace ONE multi-scan edge registration (cropped, device-resident) to
attribute the remaining ~540 ms/iter (expected ~60 ms)."""

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
    from iterativeclosestpoint_tpu.ops.pallas_nn import make_pallas_nn_device
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
    for s in range(2):
        w_lo = lo + s * 0.2 * ext
        sel = world[(x >= w_lo) & (x <= w_lo + 0.4 * ext)]
        scans.append(sel + rng.normal(0, 0.01, sel.shape))

    # Mirror register_scans' reuse path for edge (0, 1).
    los = [s.min(axis=0) for s in scans]
    his = [s.max(axis=0) for s in scans]
    offset = (np.min(los, axis=0) + np.max(his, axis=0)) / 2.0
    tgt = scans[0]
    lo0, hi0 = tgt.min(axis=0), tgt.max(axis=0)
    m = 0.05 * float((hi0 - lo0).max())
    srcj = scans[1]
    sub = srcj[np.all((srcj >= lo0 - m) & (srcj <= hi0 + m), axis=1)]
    log(f"target {len(tgt)}, source cropped {len(sub)} of {len(srcj)}")

    tgt_local = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgt_local)
    prepared = make_pallas_nn_device(tgt_local, target_dev=tgt_dev)
    log(f"grid resolution {prepared[2]}")
    src_dev = jax.device_put((sub - offset).astype(np.float32))

    kw = dict(dtype=jnp.float32, max_iterations=ITERS, tolerance=0.0,
              mode="gui", return_registered=False,
              device_data=(src_dev, tgt_dev, offset), prepared_nn=prepared)
    t0 = time.perf_counter()
    r = icp_register(sub, tgt, **kw)
    log(f"edge warmup {time.perf_counter()-t0:.1f}s rmse={r.rmse:.4f} "
        f"iters={r.iterations}")
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        icp_register(sub, tgt, **kw)
        ts.append(time.perf_counter() - t0)
    log(f"edge min {min(ts):.3f}s ({min(ts)/ITERS*1e3:.1f} ms/iter)")

    with jax.profiler.trace("/tmp/trace_edge"):
        icp_register(sub, tgt, **kw)
    from tools.trace_tool import top_ops

    top_ops("/tmp/trace_edge", 20)


if __name__ == "__main__":
    main()
