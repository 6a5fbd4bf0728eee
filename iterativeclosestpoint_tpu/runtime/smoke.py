"""On-device kernel smoke check (round-1 VERDICT W5).

A small single-shape exactness assertion of the Pallas NN kernels
against brute force, runnable on the real chip in well under a minute of
device time (compiles dominate on cold caches): DMA alignment, SMEM
budget, and extraction-precision regressions surface here before the
10-minute headline bench. ``bench.py`` runs it first; standalone:

    python -m iterativeclosestpoint_tpu.runtime.smoke
"""

from __future__ import annotations

import time


def kernel_smoke(n: int = 16384, m: int = 50_000, seed: int = 3) -> dict:
    """Exactness of both fine kernels' full repair chains vs brute force
    on one small shape each (surface regime for the x-slab sweep, volume
    regime for the z-column kernel). Raises AssertionError on any
    mismatch; returns wall-clock per check."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    rng = np.random.default_rng(seed)
    out = {}
    for kernel, kind in (("sweep", "terrain"), ("zcol", "uniform")):
        if kind == "terrain":
            tgt = make_cloud(m, seed=seed, kind="terrain", extent=50.0)
        else:
            tgt = rng.uniform(-25, 25, (m, 3))
        q = tgt[rng.choice(m, n, replace=False)] + rng.normal(
            0, 0.05, (n, 3)
        )
        offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
        tgtl = (tgt - offset).astype(np.float32)
        ql = (q - offset).astype(np.float32)

        nn_fn, state, R = pn.make_pallas_nn_device(
            tgtl, resolution=16, kernel=kernel,
        )
        grid = state[0]
        rows, w = pn.grouped_tile_order_device(
            jnp.asarray(ql), grid.origin, grid.cell_size, resolution=R,
            group=nn_fn.layout_group,
        )
        q_dev = jnp.asarray(ql)[rows]

        t0 = time.perf_counter()
        with jax.default_matmul_precision("highest"):
            matched, dist = nn_fn(q_dev, jnp.asarray(tgtl), state)
        matched = np.asarray(matched)
        dist = np.asarray(dist)
        dt = time.perf_counter() - t0

        bi, bd = nn_bruteforce(q_dev, jnp.asarray(tgtl))
        bm = np.asarray(jnp.asarray(tgtl)[bi])
        real = np.asarray(w) > 0
        if not np.array_equal(matched[real], bm[real]):
            bad = (matched[real] != bm[real]).any(axis=1).sum()
            raise AssertionError(
                f"[{kernel}] {bad}/{real.sum()} matched coordinates "
                "differ from brute force"
            )
        derr = np.abs(dist[real] - np.asarray(bd)[real]).max()
        if derr > 1e-5:
            raise AssertionError(f"[{kernel}] distance mismatch {derr}")
        out[kernel] = dt
    return out


def main() -> int:
    res = kernel_smoke()
    for k, dt in res.items():
        print(f"smoke[{k}]: exact vs brute force OK "
              f"({dt*1e3:.0f} ms first call incl. dispatch)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
