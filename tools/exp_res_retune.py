"""Round-4: re-tune grid resolution for the fused-buffer sweep kernel.

The auto_resolution_data occupancy target (~128 pts/cell -> R=64 at the
1M terrain bench workload) was tuned when short-trange sweeps paid ~2x
per-chunk fixed costs (512-lane chunks: 140G pair/s vs 306G at 2048).
The fused-buffer kernel (_colsweep_fused_kernel) removed that penalty:
chunks run full-width across slab boundaries, so a finer grid's shorter
trange now translates ~linearly into fewer candidates. This experiment
measures the FULL pipeline (coarse + 20 fine iterations, exp_volume
methodology) at forced R in {64, 96, 128} on the terrain bench workload
to see whether the resolution sweet spot moved.

Risks probed by running the real fine loop (not a standalone kernel
call): smaller cells shrink the distance-to-window-edge certificate and
the layout ages faster (per-tile spans grow as the pose drifts), so a
finer R may mass-decertify mid-loop into the repair chain (the
trange=1280 cliff documented in make_pallas_nn_device's docstring).
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
RES = tuple(
    int(r) for r in os.environ.get("EXP_RES", "64,96,128").split(",")
)
KIND = os.environ.get("EXP_KIND", "terrain")


def make_strip_pair():
    """The exp_ms3 strip-edge shape: overlapping x-windows of one world
    cloud. The edge SLIDES ~9 m along the smooth periodic terrain during
    registration (bit-faithful to the reference) — the worst case for
    mid-loop layout aging at fine cells."""
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    world = make_cloud(2_000_000, seed=3, extent=200.0)
    x = world[:, 0]
    lo, hi = float(x.min()), float(x.max())
    ext = hi - lo
    rng = np.random.default_rng(0)
    tgt = world[(x >= lo) & (x <= lo + 0.4 * ext)]
    tgt = tgt + rng.normal(0, 0.01, tgt.shape)
    src = world[(x >= lo + 0.2 * ext) & (x <= lo + 0.48 * ext)]
    src = src + rng.normal(0, 0.01, src.shape)
    return src, tgt


def main():
    print("devices:", jax.devices(), flush=True)
    if KIND == "strip":
        src, tgt = make_strip_pair()
        n = len(src)
        print(f"strip: src={n:,} tgt={len(tgt):,}", flush=True)
    else:
        src, tgt, _ = make_registration_pair(
            n=N, seed=7, noise_sigma=0.02, kind=KIND, extent=100.0
        )
        n = N
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    src_dev = jax.device_put((src - offset).astype(np.float32))

    if KIND == "strip":
        # Edges start overlapping in the world frame; the slide happens
        # DURING the fine iterations (max aging stress) — no coarse pass,
        # like register_scans' per-edge loop.
        initial = None
    else:
        stride = max(1, -(-n // 30_000))
        coarse = icp_register(
            src[::stride], tgt[::stride], dtype=jnp.float32,
            max_iterations=15, tolerance=1e-4, return_registered=False,
        )
        print(f"coarse rmse={coarse.rmse:.4f}", flush=True)
        initial = coarse.transform

    def fine(prepared):
        return icp_register(
            src, tgt, dtype=jnp.float32, prepared_nn=prepared,
            device_data=(src_dev, tgt_dev, offset),
            initial_transform=initial,
            max_iterations=ITERS, tolerance=0.0, return_registered=False,
        )

    for R in RES:
        tr = pn.auto_trange(tgtl, R)
        print(f"[R={R}] auto_trange={tr} "
              f"candidates/query={4 * tr:,}", flush=True)
        t0 = time.perf_counter()
        prepared = pn.make_pallas_nn_device(
            tgtl, resolution=R, target_dev=tgt_dev,
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
              f"{n*ITERS/el:,.0f} pts/s/chip ({el/ITERS*1e3:.1f} ms/iter) "
              f"rmse={res.rmse:.4f}", flush=True)


if __name__ == "__main__":
    main()
