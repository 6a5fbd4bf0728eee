"""Round-4 follow-on: with the surface boost landed (R=128, trange 768,
fused chunks), the sweep kernel saved only 21% for a 2x candidate cut —
per-TILE fixed costs (slab DMA issue, query load, extraction dot)
now dominate. tile_q=256 halves the tile count; it lost at R=64 because
the doubled per-tile y-span pushed window rows past trange mid-loop
(make_pallas_nn_device docstring) — at R=128 the windows are ~4x
smaller, so there is headroom. Full fine-loop methodology
(exp_res_retune)."""

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
# (tile_q, trange); trange=None -> auto
CASES = ((128, None), (256, 1024), (256, 1536))


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

    def fine(prepared):
        return icp_register(
            src, tgt, dtype=jnp.float32, prepared_nn=prepared,
            device_data=(src_dev, tgt_dev, offset),
            initial_transform=coarse.transform,
            max_iterations=ITERS, tolerance=0.0, return_registered=False,
        )

    for tile_q, trange in CASES:
        t0 = time.perf_counter()
        prepared = pn.make_pallas_nn_device(
            tgtl, target_dev=tgt_dev, tile_q=tile_q, trange=trange,
        )
        res = fine(prepared)  # warm / compile
        tr = trange or "auto"
        print(f"[tq={tile_q} tr={tr}] warm+compile "
              f"{time.perf_counter()-t0:.1f}s: rmse={res.rmse:.4f}",
              flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = fine(prepared)
            times.append(time.perf_counter() - t0)
        el = min(times)
        print(f"[tq={tile_q} tr={tr}] best of 3: {el:.3f}s -> "
              f"{N*ITERS/el:,.0f} pts/s/chip ({el/ITERS*1e3:.1f} ms/iter) "
              f"rmse={res.rmse:.4f}", flush=True)


if __name__ == "__main__":
    main()
