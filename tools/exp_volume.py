"""TPU experiment: volume-regime throughput — x-slab sweep vs z-column
kernel (VERDICT round 1, Missing #4).

Workload: 1M-point uniform-volume pair (the SCALING.md density-regime
row that measured 8.5M pts/s with the x-slab sweep in round 1). Both
kernels run the identical coarse-then-fine pipeline via the prepared-NN
route; throughput counts the full pipeline (coarse pass + 20 fine
iterations), like bench.py.
"""

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
KIND = os.environ.get("EXP_KIND", "uniform")


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind=KIND, extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    src_dev = jax.device_put((src - offset).astype(np.float32))

    R = pn.auto_resolution_data(tgtl)
    tr = pn.auto_trange(tgtl, R)
    zr = pn.auto_zrange(tgtl, R)
    print(f"N={N} kind={KIND} R={R} auto_trange={tr} auto_zrange={zr}",
          flush=True)

    stride = max(1, -(-N // 30_000))

    def pipeline(prepared):
        coarse = icp_register(
            src[::stride], tgt[::stride], dtype=jnp.float32,
            max_iterations=15, tolerance=1e-4, return_registered=False,
        )
        return icp_register(
            src, tgt, dtype=jnp.float32, prepared_nn=prepared,
            device_data=(src_dev, tgt_dev, offset),
            initial_transform=coarse.transform,
            max_iterations=ITERS, tolerance=0.0, return_registered=False,
        )

    for kernel in ("sweep", "zcol"):
        prepared = pn.make_pallas_nn_device(
            tgtl, target_dev=tgt_dev, kernel=kernel, slabs=4,
        )
        res = pipeline(prepared)  # warm / compile
        print(f"[{kernel}] warm: rmse={res.rmse:.4f} "
              f"iters={res.iterations}", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = pipeline(prepared)
            times.append(time.perf_counter() - t0)
        el = min(times)
        print(f"[{kernel}] best of 3: {el:.3f}s -> "
              f"{N*ITERS/el:,.0f} pts/s/chip ({el/ITERS*1e3:.1f} ms/iter) "
              f"rmse={res.rmse:.4f}", flush=True)


if __name__ == "__main__":
    main()
