"""TPU experiment: is a fused Pallas rejection+moments kernel worth it?

Round-1 VERDICT Missing #1 / W1: ops/pallas_stats.fused_inlier_moments
exists but is not in the production loop; BASELINE config 3 names a
"fused covariance kernel". Decision experiment (run on the real chip):

  A. Scan-differenced in-loop attribution: three fori-loop probes at the
     bench workload's steady state —
       (1) NN kernel only,
       (2) NN + statistics (mean/σ/threshold/mask/RMSE),
       (3) NN + statistics + masked Kabsch moments + pose apply
     with result-dependent drift between iterations so XLA cannot hoist
     loop-invariant work. Δ(2-1) = stats cost as actually fused by XLA
     into the iteration; Δ(3-2) = fit cost.
  B. Standalone: the two-pass XLA stats+moments form (round 2 also
     compared the round-1 Pallas fused kernel here before deleting it —
     5.70 vs 5.27 ms at 1M; SCALING.md "hot loop B waiver").

If XLA's in-loop cost is already within noise of the streaming roofline
(~0.15 ms for 28 MB of correspondence data at 819 GB/s), the Pallas
kernel (3.2 ms standalone, 2% SoL in round 1) cannot pay for itself and
the design decision is a documented waiver.
"""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402  (THP guard)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterativeclosestpoint_tpu.models.icp import (  # noqa: E402
    _kabsch_global,
    icp_register,
    iteration_statistics,
)
from iterativeclosestpoint_tpu.ops import pallas_nn as pn  # noqa: E402
from iterativeclosestpoint_tpu.ops.se3 import apply_transform  # noqa: E402
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    make_registration_pair,
)

N = int(os.environ.get("EXP_N", 1_000_000))
ITERS = 20


def sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[-1])[:1])


def timeit(fn, reps=3):
    """Amortized in-process timing: ONE sync at the end (the ~35 ms
    device-tunnel pull would otherwise dominate; TPU dispatch is in-order
    so the last result ready ⇒ queue drained)."""
    sync(fn())  # warm/compile
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)

    print("registering to steady state...", flush=True)
    res = icp_register(src, tgt, dtype=jnp.float32, nn_backend="pallas",
                       max_iterations=25, tolerance=1e-7,
                       return_registered=True)
    q = (res.source_registered - offset).astype(np.float32)

    slabs = 4
    R = pn.auto_resolution_data(tgtl)
    trange = pn.auto_trange(tgtl, R)
    nn_fn, state, R = pn.make_pallas_nn_device(
        tgtl, resolution=R, trange=trange, slabs=slabs, target_dev=tgt_dev)
    grid = state[0]
    rows, weight = pn.grouped_tile_order_device(
        jnp.asarray(q), grid.origin, grid.cell_size, resolution=R)
    q_dev = jnp.asarray(q)[rows]
    w_dev = weight.astype(jnp.float32)
    sync(q_dev); sync(w_dev)
    print(f"N={N} R={R} trange={trange} rows={q_dev.shape}", flush=True)

    sig = jnp.asarray(3.0, jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    # --- A. scan-differenced loop probes --------------------------------
    def mk_loop(level: int):
        @jax.jit
        def run(q0, w):
            def body(i, carry):
                qq, acc = carry
                with jax.default_matmul_precision("highest"):
                    m, d = nn_fn(qq, tgt_dev, state)
                    if level == 0:
                        # drift by a result-dependent epsilon: defeats
                        # loop-invariant hoisting, preserves steady state
                        qq2 = qq + 1e-6 * (m - qq)
                        return (qq2, acc + d[0])
                    stats = iteration_statistics(
                        d, w, sig, False, jnp.asarray(False), lambda x: x)
                    mean, std, thr, valid, vcount, rmse, _ = stats
                    if level == 1:
                        qq2 = qq * (1.0 + 1e-9 * rmse / (rmse + 1.0))
                        return (qq2, acc + rmse)
                    T = _kabsch_global(qq, m, valid, lambda x: x)
                    qq2 = apply_transform(T, qq)
                    return (qq2, acc + rmse)

            return jax.lax.fori_loop(0, ITERS, body, (q0, 0.0))

        return run

    names = ["nn-only", "nn+stats", "nn+stats+kabsch+apply"]
    times = []
    for lvl in (0, 1, 2):
        run = mk_loop(lvl)  # ONE jit wrapper per level (no re-tracing)
        dt = timeit(lambda: run(q_dev, w_dev)) / ITERS
        times.append(dt)
        print(f"loop[{names[lvl]}]: {dt*1e3:.2f} ms/iter", flush=True)
    print(f"Δ stats in-loop        = {(times[1]-times[0])*1e3:.2f} ms/iter",
          flush=True)
    print(f"Δ kabsch+apply in-loop = {(times[2]-times[1])*1e3:.2f} ms/iter",
          flush=True)

    # --- B. standalone stats paths ---------------------------------------
    with jax.default_matmul_precision("highest"):
        m3, d = jax.jit(lambda qq: nn_fn(qq, tgt_dev, state))(q_dev)
    sync(m3)
    thr_v = jnp.asarray(
        float(jnp.mean(d)) + 3.0 * float(jnp.std(d)), jnp.float32)

    @jax.jit
    def xla_stats(src_, dst_, dist_, w_, thr_):
        with jax.default_matmul_precision("highest"):
            v = jnp.logical_and(dist_ <= thr_, w_ > 0).astype(jnp.float32)
            cnt = jnp.sum(v)
            sum_d2 = jnp.sum(jnp.where(v > 0, dist_ * dist_, 0.0))
            sum_s = jnp.dot(v, src_, precision=hi)
            sum_t = jnp.dot(v, dst_, precision=hi)
            M = jnp.dot((src_ * v[:, None]).T, dst_, precision=hi)
            return rigid_from_fused_moments(cnt, sum_s, sum_t, M), cnt, sum_d2

    dt_x = timeit(lambda: xla_stats(q_dev, m3, d, w_dev, thr_v), reps=5)
    print(f"standalone XLA stats+moments+fit: {dt_x*1e3:.2f} ms", flush=True)

    # Historical note: this experiment also timed the round-1 Pallas
    # fused_inlier_moments kernel on the same inputs (5.70 ms vs 5.27 ms
    # for the XLA form above, 1M points). The kernel was deleted after
    # the waiver decision (SCALING.md "hot loop B waiver").
    roofline = (q_dev.size * 4 * 2 + q_dev.shape[0] * 8) / 819e9
    print(f"streaming roofline for the pass: {roofline*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
