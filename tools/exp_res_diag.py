"""Diagnose the R=256 fine-loop collapse at 1M terrain (exp_res_retune):
standalone kernel cert rate + time at the aligned pose, R in {128, 256}.
Distinguishes structural decertification (low cert even aligned) from
mid-loop layout aging."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterativeclosestpoint_tpu.ops import pallas_nn as pn  # noqa: E402
from iterativeclosestpoint_tpu.utils.hostmath import bbox  # noqa: E402
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    apply_transform_np,
    make_registration_pair,
)


def _sync(x):
    np.asarray(jnp.ravel(x)[:1])


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, T_true = make_registration_pair(
        n=1_000_000, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    q_np = (apply_transform_np(T_true, src) - offset).astype(np.float32)
    lo3, hi3 = bbox(tgtl)
    ext = float((hi3 - lo3).max())

    for R in (128, 256):
        tr = pn.auto_trange(tgtl, R)
        grid = pn._build_grid_dev(
            tgt_dev, jnp.asarray(lo3, jnp.float32),
            jnp.asarray(max(ext / R, 1e-9), jnp.float32),
            resolution=R, trange=tr,
        )
        rows, w = pn.grouped_tile_order_device(
            jnp.asarray(q_np), grid.origin, grid.cell_size, resolution=R,
            group="x",
        )
        q_dev = jnp.asarray(q_np)[rows]
        n_rows = q_dev.shape[0]
        print(f"[R={R}] trange={tr} rows={n_rows:,} "
              f"(pad {100*(n_rows/1e6-1):.1f}%)", flush=True)
        out = pn.nn_colsweep(q_dev, grid, resolution=R, slabs=4, trange=tr)
        _sync(out[2])
        t0 = time.perf_counter()
        for _ in range(10):
            out = pn.nn_colsweep(
                q_dev, grid, resolution=R, slabs=4, trange=tr)
        _sync(out[2])
        dt = (time.perf_counter() - t0) / 10
        cert = float(jnp.sum(out[3].astype(jnp.float32) * w) / jnp.sum(w))
        print(f"[R={R}] kernel {dt*1e3:.2f} ms  cert={cert*100:.3f}%",
              flush=True)


if __name__ == "__main__":
    main()
