"""Round-3 W1 part 2: attribute the fine loop's 44.8 ms/iter (kernel is
27.4 standalone), decompose the 574 ms grid_build stage, and measure the
upload-reorder win (coarse inputs uploaded BEFORE the 24 MB so the coarse
pass truly overlaps the big transfers)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np


def log(*a):
    print(*a, flush=True)


def sync(x):
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if isinstance(l, jax.Array)]
    if leaves:
        np.asarray(jnp.ravel(leaves[-1])[:1])


def main():
    import jax
    import jax.numpy as jnp

    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
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

    log("== warmup/compile (full pipeline) ==")
    t0 = time.perf_counter()
    res = icp_register_multiscale(src, tgt, **kwargs)
    log(f"warmup {time.perf_counter() - t0:.1f}s rmse={res.final.rmse:.6f}")
    # Coarse transform = the fine level's actual starting pose.
    T_coarse = res.levels[0][1].transform

    # ---- grid_build decomposition ----
    log("== grid_build decomposition (warm) ==")
    from iterativeclosestpoint_tpu.utils.hostmath import center_offset

    offset = center_offset(tgt)
    tgt_local = (tgt - offset).astype(np.float32)
    src_local = (src - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgt_local)
    src_dev = jax.device_put(src_local)
    sync((tgt_dev, src_dev))

    from iterativeclosestpoint_tpu.ops.cellblock import auto_resolution_data

    t0 = time.perf_counter()
    R = auto_resolution_data(tgt_local)
    t1 = time.perf_counter()
    tr = pn.auto_trange(tgt_local, R)
    t2 = time.perf_counter()
    log(f"host: auto_resolution {1e3*(t1-t0):.0f} ms, "
        f"auto_trange {1e3*(t2-t1):.0f} ms (R={R}, trange={tr})")
    for i in range(3):
        t0 = time.perf_counter()
        prepared = pn.make_pallas_nn_device(
            tgt_local, target_dev=tgt_dev)
        sync(prepared[1])
        log(f"make_pallas_nn_device warm {i}: "
            f"{1e3*(time.perf_counter()-t0):.0f} ms")

    # ---- fine-loop trace ----
    log("== fine icp_register (warm) + trace ==")
    device_data = (src_dev, tgt_dev, offset)
    fine_kwargs = dict(
        dtype=jnp.float32, nn_backend="pallas", max_iterations=ITERS,
        tolerance=0.0, return_registered=False,
        device_data=device_data, prepared_nn=prepared,
        initial_transform=T_coarse,
    )
    t0 = time.perf_counter()
    rf = icp_register(src, tgt, **fine_kwargs)
    log(f"fine total (incl prep/package) warm0: "
        f"{time.perf_counter()-t0:.3f}s rmse={rf.rmse:.6f}")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        rf = icp_register(src, tgt, **fine_kwargs)
        times.append(time.perf_counter() - t0)
    log(f"fine total min {min(times):.3f}s "
        f"({min(times)/ITERS*1e3:.1f} ms/iter incl fixed)")

    trace_dir = "/tmp/trace_fine"
    with jax.profiler.trace(trace_dir):
        rf = icp_register(src, tgt, **fine_kwargs)
    log("== trace top ops ==")
    from tools.trace_tool import top_ops

    top_ops(trace_dir, 25)

    # ---- upload-order probe ----
    log("== upload reorder probe ==")
    # Current order: big puts first, coarse waits behind them.
    s_sub = src[:: max(1, -(-len(src) // 30_000))]
    t_sub = tgt[:: max(1, -(-len(tgt) // 30_000))]
    # Warm the coarse shapes.
    icp_register(s_sub, t_sub, dtype=jnp.float32, max_iterations=15,
                 tolerance=1e-4, nn_backend="auto", mode="gui",
                 return_registered=False)

    def run(order):
        t0 = time.perf_counter()
        if order == "big_first":
            b1 = jax.device_put(src_local)
            b2 = jax.device_put(tgt_local)
        rc = icp_register(s_sub, t_sub, dtype=jnp.float32,
                          max_iterations=15, tolerance=1e-4,
                          nn_backend="auto", mode="gui",
                          return_registered=False)
        t_coarse_done = time.perf_counter() - t0
        if order == "coarse_first":
            b1 = jax.device_put(src_local)
            b2 = jax.device_put(tgt_local)
        sync((b1, b2))
        return t_coarse_done, time.perf_counter() - t0

    for order in ("big_first", "coarse_first", "big_first", "coarse_first"):
        c, a = run(order)
        log(f"{order}: coarse done {c:.3f}s, coarse+24MB all done {a:.3f}s")


if __name__ == "__main__":
    main()
