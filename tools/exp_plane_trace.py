"""Round-5 verdict item 2: trace-attribute the plane-mode fine loop at
1M (33.9 ms/iter round 4 vs point's 22.1 → where do the extra ~12 ms
go? The NN kernel is shape-identical in both modes — the gap must be in
normals estimation reuse, the 6x6 solve, repair-gather width, or the
statistics chain)."""

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
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    N = 1_000_000
    ITERS = 20
    log(f"devices: {jax.devices()}")
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    src_dev = jax.device_put((src - offset).astype(np.float32))

    stride = max(1, -(-N // 30_000))
    coarse = icp_register(
        src[::stride], tgt[::stride], dtype=jnp.float32,
        max_iterations=15, tolerance=1e-4, return_registered=False,
    )
    log(f"coarse rmse={coarse.rmse:.4f}")

    prepared = pn.make_pallas_nn_device(
        tgtl, target_dev=tgt_dev, with_normals=True,
    )
    kwargs = dict(
        dtype=jnp.float32, prepared_nn=prepared,
        device_data=(src_dev, tgt_dev, offset),
        initial_transform=coarse.transform, estimator="plane",
        max_iterations=ITERS, tolerance=0.0, return_registered=False,
    )
    res = icp_register(src, tgt, **kwargs)
    log(f"plane warm: rmse={res.rmse:.4f} iters={res.iterations}")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = icp_register(src, tgt, **kwargs)
        times.append(time.perf_counter() - t0)
    log(f"plane fine total min {min(times):.3f}s "
        f"({min(times)/ITERS*1e3:.1f} ms/iter incl fixed)")

    trace_dir = "/tmp/trace_plane"
    with jax.profiler.trace(trace_dir):
        res = icp_register(src, tgt, **kwargs)
    log("== trace top ops ==")
    from tools.trace_tool import top_ops

    top_ops(trace_dir, 30)


if __name__ == "__main__":
    main()
