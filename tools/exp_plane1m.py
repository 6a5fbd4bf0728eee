"""Plane-mode (point-to-plane) 1M fine-loop rate with the round-4
surface boost: NN grids at the boosted R=128/trange 768 fused, cell-PCA
normals at the unboosted base R=64 (est tuple carries both). The
recommended production mode for terrain surveys — SCALING.md only had
10M plane rows before this."""

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

N = 1_000_000
ITERS = 20


def main():
    print("devices:", jax.devices(), flush=True)
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
    print(f"coarse rmse={coarse.rmse:.4f}", flush=True)

    for label, est in (("boosted", None), ("base-64", (64, 1536, 16384, 64))):
        t0 = time.perf_counter()
        prepared = pn.make_pallas_nn_device(
            tgtl, target_dev=tgt_dev, with_normals=True, est=est,
        )
        res = icp_register(
            src, tgt, dtype=jnp.float32, prepared_nn=prepared,
            device_data=(src_dev, tgt_dev, offset),
            initial_transform=coarse.transform, estimator="plane",
            max_iterations=ITERS, tolerance=0.0, return_registered=False,
        )
        print(f"[{label}] warm+compile {time.perf_counter()-t0:.1f}s: "
              f"rmse={res.rmse:.4f} iters={res.iterations}", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = icp_register(
                src, tgt, dtype=jnp.float32, prepared_nn=prepared,
                device_data=(src_dev, tgt_dev, offset),
                initial_transform=coarse.transform, estimator="plane",
                max_iterations=ITERS, tolerance=0.0,
                return_registered=False,
            )
            times.append(time.perf_counter() - t0)
        el = min(times)
        print(f"[{label}] best of 3: {el:.3f}s -> "
              f"{N*ITERS/el:,.0f} pts/s/chip ({el/ITERS*1e3:.1f} ms/iter) "
              f"rmse={res.rmse:.4f}", flush=True)


if __name__ == "__main__":
    main()
