"""TPU experiment: 10M-point partitioned-target registration on the real
chip (VERDICT round 1, next-round item #1's measurement half).

One v5e chip is all this environment has, so the mesh is 1-device — the
point here is that the PRODUCTION partitioned machinery (per-slab Pallas
grid built on device from the far-padded slab buffer, margin certificate,
budgeted collective repair, estimator plumbing, segmented dispatch) runs
a 10M-point registration end-to-end on real hardware at a measured
pts/s/chip; the cross-device semantics (tie combine, halo exchange) are
CPU-mesh-tested (tests/test_partition.py). Compares against the standard
single-device path on the same workload.
"""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterativeclosestpoint_tpu.models.icp import icp_register  # noqa: E402
from iterativeclosestpoint_tpu.models.multiscale import (  # noqa: E402
    icp_register_multiscale,
)
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh  # noqa: E402
from iterativeclosestpoint_tpu.parallel.partition import (  # noqa: E402
    icp_register_partitioned,
)
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    make_registration_pair,
)

N = int(os.environ.get("EXP_N", 10_000_000))
ITERS = int(os.environ.get("EXP_ITERS", 20))


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )

    # Coarse alignment via the full multiscale ladder (the production 10M
    # recipe: each level starts within its grid's cell size, so the
    # partition layout and certificates start aligned — a single
    # stride-334 coarse leaves ~0.5 m of residual, which mass-decertifies
    # an R=256 fine grid whose cells are 0.78 m).
    coarse = icp_register_multiscale(
        src, tgt, dtype=jnp.float32, nn_backend="pallas",
        estimator="plane", max_iterations=8, tolerance=1e-7,
        return_registered=False,
    ).final
    print(f"ladder init: rmse={coarse.rmse:.4f}", flush=True)

    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} device(s)", flush=True)

    def run_part():
        return icp_register_partitioned(
            src, tgt, mesh=mesh, dtype=jnp.float32,
            estimator="plane", initial_transform=coarse.transform,
            max_iterations=ITERS, tolerance=0.0,
            return_registered=False,
        )

    res = run_part()  # warm/compile
    print(f"[partitioned] warm: iters={res.iterations} "
          f"rmse={res.rmse:.4f} ({res.message})", flush=True)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        res = run_part()
        times.append(time.perf_counter() - t0)
    el = min(times)
    print(f"[partitioned] best: {el:.3f}s -> {N*ITERS/el:,.0f} pts/s/chip "
          f"({el/ITERS*1e3:.1f} ms/iter) rmse={res.rmse:.4f}", flush=True)

    # Reference: the standard (replicated-target) path on the same work.
    def run_std():
        return icp_register_multiscale(
            src, tgt, dtype=jnp.float32, nn_backend="pallas",
            estimator="plane", max_iterations=ITERS, tolerance=0.0,
            coarse_max_points=30_000, coarse_iterations=15,
            return_registered=False,
        )

    res2 = run_std()
    print(f"[standard] warm: rmse={res2.final.rmse:.4f}", flush=True)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        res2 = run_std()
        times.append(time.perf_counter() - t0)
    el2 = min(times)
    print(f"[standard] best: {el2:.3f}s -> {N*ITERS/el2:,.0f} pts/s/chip "
          f"({el2/ITERS*1e3:.1f} ms/iter) rmse={res2.final.rmse:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
