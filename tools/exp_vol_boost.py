"""Does the round-4 resolution boost generalize to the VOLUME regime?
Surface clouds gained 41% from one pow-2 notch (R 64->128) once the
fused kernel removed the short-chunk penalty; the zcol kernel got the
same fused treatment, and the 1M uniform-volume workload at R=64 keeps
~41 pts per occupied cell (>= the measured-safe 32 edge). Full
coarse+fine pipeline per rep (exp_res_retune methodology), volume
workload, forced R in {32 (today's auto), 64}."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterativeclosestpoint_tpu.models.icp import icp_register  # noqa: E402
from iterativeclosestpoint_tpu.ops import pallas_nn as pn  # noqa: E402
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    make_registration_pair,
)

N = int(os.environ.get("EXP_N", 1_000_000))
ITERS = 20
RES = tuple(int(r) for r in os.environ.get("EXP_RES", "32,64").split(","))


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="uniform", extent=100.0
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
    print(f"coarse rmse={coarse.rmse:.4f}", flush=True)

    def fine(prepared):
        return icp_register(
            src, tgt, dtype=jnp.float32, prepared_nn=prepared,
            device_data=(src_dev, tgt_dev, offset),
            initial_transform=coarse.transform,
            max_iterations=ITERS, tolerance=0.0, return_registered=False,
        )

    for R in RES:
        zr = pn.auto_zrange(tgtl, R)
        print(f"[R={R}] auto_zrange={zr} candidates/query={12 * zr:,}",
              flush=True)
        t0 = time.perf_counter()
        prepared = pn.make_pallas_nn_device(
            tgtl, resolution=R, target_dev=tgt_dev, kernel="zcol",
        )
        res = fine(prepared)  # warm / compile
        print(f"[R={R}] warm+compile {time.perf_counter()-t0:.1f}s: "
              f"rmse={res.rmse:.4f} iters={res.iterations}", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = fine(prepared)
            times.append(time.perf_counter() - t0)
        el = min(times)
        print(f"[R={R}] best of 3: {el:.3f}s -> "
              f"{N*ITERS/el:,.0f} pts/s/chip ({el/ITERS*1e3:.1f} ms/iter) "
              f"rmse={res.rmse:.4f}", flush=True)


if __name__ == "__main__":
    main()
