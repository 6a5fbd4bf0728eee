"""Fixed-cost attribution experiment for the headline bench (round-3 W1).

Questions:
  1. What does the blended pipeline decompose into (warmed two-pass
     synced breakdown)?
  2. What does the coarse pass cost standalone, warm?
  3. Do the big device_put transfers delay the coarse pass's own small
     upload/compute (FIFO transfer queue), i.e. is the designed
     coarse/upload overlap actually happening?
  4. What does trimming coarse_iterations buy, and does the fine level
     still converge from the shallower coarse pose?
"""

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
    from iterativeclosestpoint_tpu.runtime.timing import collect
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

    log("== warmup/compile ==")
    t0 = time.perf_counter()
    res = icp_register_multiscale(src, tgt, **kwargs)
    log(f"warmup {time.perf_counter() - t0:.1f}s rmse={res.final.rmse:.6f} "
        f"iters={res.final.iterations}")

    log("== blended timed runs ==")
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        icp_register_multiscale(src, tgt, **kwargs)
        dt = time.perf_counter() - t0
        times.append(dt)
        log(f"run {i}: {dt:.3f}s")
    log(f"blended min {min(times):.3f}s -> {N * ITERS / min(times):,.0f} pts/s")

    log("== two-pass synced breakdown (pass 2 reported) ==")
    with collect(sync=True):
        icp_register_multiscale(src, tgt, **kwargs)
    with collect(sync=True) as col:
        icp_register_multiscale(src, tgt, **kwargs)
    for line in col.lines():
        log(f"  {line}")

    log("== coarse standalone (30k, 15 iters, warm) ==")
    s_sub = src[:: max(1, -(-len(src) // 30_000))]
    t_sub = tgt[:: max(1, -(-len(tgt) // 30_000))]
    for i in range(3):
        t0 = time.perf_counter()
        rc = icp_register(
            s_sub, t_sub, dtype=jnp.float32, max_iterations=15,
            tolerance=1e-4, nn_backend="auto", mode="gui",
            return_registered=False,
        )
        log(f"coarse run {i}: {time.perf_counter() - t0:.3f}s "
            f"iters={rc.iterations}")

    log("== transfer-queue probe ==")
    # Does a small dispatch (enqueued after 24 MB of device_put) wait for
    # the transfers? Time: put small, run small-op, pull — with and
    # without 24 MB of puts enqueued first.
    big1 = (src - src.mean(0)).astype(np.float32)
    big2 = (tgt - tgt.mean(0)).astype(np.float32)
    small = s_sub.astype(np.float32)

    f = jax.jit(lambda x: jnp.sum(x * x))
    # warm
    np.asarray(f(jnp.asarray(small)))
    t0 = time.perf_counter()
    sm = jnp.asarray(small)
    r = f(sm)
    np.asarray(r)
    log(f"small alone: {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    b1 = jax.device_put(big1)
    b2 = jax.device_put(big2)
    sm = jnp.asarray(small)
    r = f(sm)
    np.asarray(r)
    dt_small_after_big = time.perf_counter() - t0
    np.asarray(jnp.ravel(b2)[:1])
    dt_all = time.perf_counter() - t0
    log(f"small after 24MB puts: {dt_small_after_big:.3f}s "
        f"(all transfers done at {dt_all:.3f}s)")

    log("== coarse_iterations=8 variant (recompiles the 8-iter loop) ==")
    kw8 = dict(kwargs, coarse_iterations=8)
    t0 = time.perf_counter()
    r8 = icp_register_multiscale(src, tgt, **kw8)
    log(f"warmup {time.perf_counter() - t0:.1f}s rmse={r8.final.rmse:.6f} "
        f"iters={r8.final.iterations}")
    times8 = []
    for i in range(3):
        t0 = time.perf_counter()
        r8 = icp_register_multiscale(src, tgt, **kw8)
        times8.append(time.perf_counter() - t0)
    log(f"blended(coarse=8) min {min(times8):.3f}s rmse={r8.final.rmse:.6f} "
        f"-> {N * ITERS / min(times8):,.0f} pts/s")


if __name__ == "__main__":
    main()
