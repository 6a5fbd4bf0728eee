"""Round-5 verdict item 6 closure: decompose the fused sweep kernel's
time into per-PAIR work and per-TILE fixed cost, same process same day.

t(config) = a * tiles + b * pairs. Measure several (trange, chunk)
configs at the same query set/grid resolution ladder and fit. The
verdict's 306-vs-215 Gpair/s "gap" compares configs with different
lanes-per-tile: at trange 768 a tile amortizes its fixed cost (4 DMA
issues, output write, Mosaic grid-step overhead) over 3072 lanes vs
8192 at trange 2048, so pair-rate is not the right ruler — the per-tile
fixed cost is."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    N = 1_000_000
    log(f"devices: {jax.devices()}")
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    res = icp_register(src, tgt, dtype=jnp.float32, nn_backend="pallas",
                       max_iterations=25, tolerance=1e-7,
                       return_registered=True)
    q = (res.source_registered - offset).astype(np.float32)

    slabs = 4
    R = pn.auto_resolution_data(tgtl, surface_boost_occupancy=32)
    # Build with the LARGEST probed trange so every window fits the
    # grid's row padding (smaller tranges just sweep less of it).
    nn_fn, state, R = pn.make_pallas_nn_device(
        tgtl, resolution=R, trange=3072, slabs=slabs, target_dev=tgt_dev)
    grid = state[0]
    rows, _ = pn.grouped_tile_order_device(
        jnp.asarray(q), grid.origin, grid.cell_size, resolution=R)
    q_dev = jnp.asarray(q)[rows]
    np.asarray(jnp.ravel(q_dev)[:1])
    tiles = len(q_dev) // 128

    def _sync(out):
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[-1])[:1])

    def time_kernel(fn, reps=20):
        _sync(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _sync(out)
        return (time.perf_counter() - t0) / reps

    points = []
    for trange, fused, chunk in [
        (768, True, 3072), (768, True, 2048),
        (1024, True, 4096), (1536, False, 2048),
        (2048, False, 2048), (3072, False, 2048),
    ]:
        dt = time_kernel(
            lambda: pn.nn_colsweep(q_dev, grid, resolution=R, slabs=slabs,
                                   trange=trange, fused=fused, chunk=chunk))
        pairs = len(q_dev) * slabs * trange
        log(f"trange={trange:5d} fused={int(fused)} chunk={chunk}: "
            f"{dt*1e3:6.2f} ms  {pairs/dt/1e9:6.1f} Gpair/s")
        points.append((trange, dt, fused))

    # Fit t = a*tiles + b*pairs over the slot-wise family (same form),
    # then express each fused config's fixed cost against that b.
    sw = [(tr, dt) for tr, dt, f in points if not f]
    A = np.array([[tiles, tiles * 128 * slabs * tr] for tr, _ in sw])
    y = np.array([dt for _, dt in sw])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    a, b = coef
    log(f"slot-wise fit: per-tile fixed {a*1e6:.2f} us, per-pair "
        f"{1/b/1e9:.0f} Gpair/s asymptotic")
    for tr, dt, f in points:
        if f:
            fx = (dt - b * tiles * 128 * slabs * tr) / tiles
            log(f"fused trange={tr}: implied per-tile fixed "
                f"{fx*1e6:.2f} us ({fx*tiles/dt*100:.0f}% of call)")


if __name__ == "__main__":
    main()
