"""Round-5 verdict item 6: the fused sweep kernel runs at ~215G pair/s on
the boosted config (R=128, trange=768, slabs=4) vs 306G with full-width
2048-lane chunks. Hypothesis: the residual per-chunk fixed cost — at
slabs*trange = 3072 total lanes the chunk loop runs 2048 + 1024, paying
the fixed cost twice and the second time at half width. Sweep the chunk
parameter (1024/1536/2048/3072); 3072 = ONE full-width chunk per tile.
Also probe the unboosted shape (R=64/1536 slot-wise vs fused variants)
for the record."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

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
    trange = pn.auto_trange(tgtl, R)
    log(f"config: R={R} trange={trange} slabs={slabs}")
    nn_fn, state, R = pn.make_pallas_nn_device(
        tgtl, resolution=R, trange=trange, slabs=slabs, target_dev=tgt_dev)
    grid = state[0]
    rows, _ = pn.grouped_tile_order_device(
        jnp.asarray(q), grid.origin, grid.cell_size, resolution=R)
    q_dev = jnp.asarray(q)[rows]
    np.asarray(jnp.ravel(q_dev)[:1])

    def _sync(out):
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[-1])[:1])

    def time_kernel(fn, reps=20):
        _sync(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _sync(out)
        return (time.perf_counter() - t0) / reps, out

    pairs = len(q_dev) * slabs * trange

    ref = None
    for fused, chunk in [
        (True, 2048),       # production today
        (True, 1024),
        (True, 1536),
        (True, slabs * trange),  # ONE full-width chunk
        (False, 2048),      # slot-wise for the record
        (False, trange),
    ]:
        try:
            dt, out = time_kernel(
                lambda: pn.nn_colsweep(q_dev, grid, resolution=R,
                                       slabs=slabs, trange=trange,
                                       fused=fused, chunk=chunk))
        except Exception as e:
            log(f"fused={fused} chunk={chunk}: FAILED {str(e)[:160]}")
            continue
        cert = float(jnp.mean(out[3].astype(jnp.float32)))
        gpairs = pairs / dt / 1e9
        log(f"fused={int(fused)} chunk={chunk:5d}: {dt*1e3:6.2f} ms  "
            f"{gpairs:6.1f} Gpair/s  cert={cert*100:.2f}%")
        if ref is None:
            ref = out
        else:
            same = all(
                bool(jnp.array_equal(a, b)) for a, b in zip(ref[:3], out[:3])
            )
            log(f"   exact-equal vs production: {same}")


if __name__ == "__main__":
    main()
