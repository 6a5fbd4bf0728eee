"""Round-4: does the fused-buffer kernel also help the x-slab SWEEP at
sub-2048 tranges (terrain 4x1536, strip edges 4x768)? Times both forms
on the terrain bench workload + a strip-edge-like workload."""

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
from iterativeclosestpoint_tpu.utils.hostmath import bbox  # noqa: E402
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    apply_transform_np,
    make_registration_pair,
)


def _sync(out):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[-1])[:1])


def timeit(fn, reps=20):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / reps, out


def bench_case(name, tgt, q_world, slabs=4):
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    q_np = (q_world - offset).astype(np.float32)
    R = auto_resolution_data(tgtl)
    tr = pn.auto_trange(tgtl, R)
    lo3, hi3 = bbox(tgtl)
    ext = float((hi3 - lo3).max())
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
    print(f"[{name}] R={R} trange={tr} rows={q_dev.shape[0]:,}", flush=True)
    for fused in (False, True):
        dt, out = timeit(lambda: pn.nn_colsweep(
            q_dev, grid, resolution=R, slabs=slabs, trange=tr,
            fused=fused))
        cert = float(jnp.sum(out[3].astype(jnp.float32) * w) / jnp.sum(w))
        print(f"[{name}] fused={fused}: {dt*1e3:.2f} ms "
              f"cert={cert*100:.2f}%", flush=True)
    # exactness spot check of the fused form
    from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce

    sel = jnp.asarray(np.sort(np.random.default_rng(0).choice(
        q_dev.shape[0], 10_000, replace=False)))
    bi, bd = nn_bruteforce(q_dev[sel], tgt_dev)
    dz, cz = out[2][sel], out[3][sel]
    ok = jnp.where(cz, jnp.abs(dz - bd) < 1e-5, True)
    print(f"[{name}] fused exactness on certified: "
          f"{float(jnp.mean(ok.astype(jnp.float32)))*100:.3f}%", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, T_true = make_registration_pair(
        n=1_000_000, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    q = apply_transform_np(T_true, src)
    bench_case("terrain-1M", tgt, q)

    # Strip-edge-like: 800k window of a 2M world (R=128, trange ~768).
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    world = make_cloud(2_000_000, seed=3, extent=200.0)
    x = world[:, 0]
    lo, hi = float(x.min()), float(x.max())
    ext = hi - lo
    rng = np.random.default_rng(0)
    t_strip = world[(x >= lo) & (x <= lo + 0.4 * ext)]
    t_strip = t_strip + rng.normal(0, 0.01, t_strip.shape)
    s_strip = world[(x >= lo + 0.2 * ext) & (x <= lo + 0.48 * ext)]
    bench_case("strip-800k", t_strip, s_strip)


if __name__ == "__main__":
    main()
