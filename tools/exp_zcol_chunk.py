"""Round-5 extra: does the single-chunk treatment help the zcol kernel?
The volume fine iteration is now ~pure kernel (33.1 ms/iter vs 32.7 ms
standalone), and the fused zcol buffer is 12 slots x zrange 512 = 6144
lanes chunked 2048x3 — probe chunk widths 2048/3072/6144 on the 1M
uniform workload at the steady pose."""

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
    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.ops.cellblock import auto_resolution_data
    from iterativeclosestpoint_tpu.utils.hostmath import bbox, center_offset
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    N = 1_000_000
    log(f"devices: {jax.devices()}")
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="uniform", extent=100.0
    )
    res = icp_register_multiscale(
        src, tgt, coarse_max_points=30_000, coarse_iterations=15,
        max_iterations=20, tolerance=0.0, dtype=jnp.float32,
        nn_backend="pallas", return_registered=False,
    )
    offset = center_offset(tgt)
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    T = res.final.transform
    q = ((src @ T[:3, :3].T + T[:3, 3]) - offset).astype(np.float32)

    R = auto_resolution_data(tgtl)
    zr = pn.auto_zrange(tgtl, R)
    log(f"R={R} zrange={zr}")
    lo3, hi3 = bbox(tgtl)
    cell3 = np.maximum((hi3 - lo3) / R, 1e-9).astype(np.float32)
    grid = pn._build_zgrid_dev(
        tgt_dev, jnp.asarray(lo3, jnp.float32), jnp.asarray(cell3),
        resolution=R, zrange=zr,
    )
    rows, weight = pn.grouped_tile_order_device(
        jnp.asarray(q), grid.origin, grid.cell_size, resolution=R,
        group="xy",
    )
    q_dev = jnp.asarray(q)[rows]
    np.asarray(jnp.ravel(q_dev)[:1])

    def _sync(out):
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[-1])[:1])

    ref = None
    for chunk in (2048, 3072, 6144):
        try:
            fn = lambda: pn.nn_colsweep_z(
                q_dev, grid, resolution=R, zrange=zr, chunk=chunk)
            _sync(fn())
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn()
            _sync(out)
            dt = (time.perf_counter() - t0) / 20
        except Exception as e:
            log(f"chunk={chunk}: FAILED {str(e)[:200]}")
            continue
        w = weight.astype(jnp.float32)
        cert = float(jnp.sum(out[3].astype(jnp.float32) * w) / jnp.sum(w))
        log(f"chunk={chunk}: {dt*1e3:6.2f} ms  cert={cert*100:.1f}%")
        if ref is None:
            ref = out
        else:
            same = all(bool(jnp.array_equal(a, b))
                       for a, b in zip(ref[:3], out[:3]))
            log(f"   exact-equal vs chunk 2048: {same}")


if __name__ == "__main__":
    main()
