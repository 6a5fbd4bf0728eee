"""TPU timing: fused-buffer zcol kernel (round-4 W1 fix) vs the 49.7 ms
slot-wise baseline on the 1M uniform workload, plus the zcol SoL line."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterativeclosestpoint_tpu.ops import pallas_nn as pn  # noqa: E402
from iterativeclosestpoint_tpu.ops.cellblock import (  # noqa: E402
    auto_resolution_data,
)
from iterativeclosestpoint_tpu.runtime.profiling import (  # noqa: E402
    nn_kernel_report,
)
from iterativeclosestpoint_tpu.utils.hostmath import bbox  # noqa: E402
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    apply_transform_np,
    make_registration_pair,
)

N = int(os.environ.get("EXP_N", 1_000_000))


def _sync(out):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[-1])[:1])


def timeit(fn, reps=20):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, T_true = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="uniform", extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    q_np = (apply_transform_np(T_true, src) - offset).astype(np.float32)

    R = auto_resolution_data(tgtl)
    zr = pn.auto_zrange(tgtl, R)
    print(f"N={N} R={R} zrange={zr}", flush=True)
    lo3, hi3 = bbox(tgtl)
    cell3 = np.maximum((hi3 - lo3) / R, 1e-9)
    zgrid = pn._build_zgrid_dev(
        tgt_dev, jnp.asarray(lo3, jnp.float32),
        jnp.asarray(cell3.astype(np.float32)), resolution=R, zrange=zr,
    )
    q_dev = jnp.asarray(q_np)
    rows, w = pn.grouped_tile_order_device(
        q_dev, zgrid.origin, zgrid.cell_size, resolution=R, group="xy"
    )
    q_xy = q_dev[rows]

    dt, out = timeit(lambda: pn.nn_colsweep_z(
        q_xy, zgrid, resolution=R, zrange=zr))
    cert = float(jnp.sum(out[3].astype(jnp.float32) * w) / jnp.sum(w))
    print(f"[zcol FUSED] {dt*1e3:.2f} ms cert={cert*100:.2f}% "
          f"rows={q_xy.shape[0]:,}", flush=True)
    print(nn_kernel_report(q_xy.shape[0], 128, 12, zr, dt,
                           name="nn-zcol-fused").line(), flush=True)

    # Exactness spot check vs brute on a 20k subsample (certified rows).
    from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce

    sel = jnp.asarray(np.sort(np.random.default_rng(0).choice(
        q_xy.shape[0], 20_000, replace=False)))
    qs = q_xy[sel]
    bi, bd = nn_bruteforce(qs, tgt_dev)
    dz = out[2][sel]
    cz = out[3][sel]
    mz = out[0][sel]
    ok = jnp.where(cz, jnp.abs(dz - bd) < 1e-5, True)
    mok = jnp.where(cz[:, None], jnp.abs(mz - tgt_dev[bi]) < 1e-4, True)
    print(f"exactness: dist ok {float(jnp.mean(ok.astype(jnp.float32)))*100:.3f}% "
          f"matched ok {float(jnp.mean(mok.astype(jnp.float32)))*100:.3f}%",
          flush=True)


if __name__ == "__main__":
    main()
