"""Round-5 verdict item 5: attack the 10M fine-loop rate via the LADDER
HANDOFF instead of gating the boost off.

Diagnosis recap (round 4, tools/exp_res_diag.py): the boosted kernel at
one-notch-finer R certifies 100% at an aligned pose — the measured
collapses come from the fine level STARTING outside the boosted cell
size (the point-to-point ladder's residual is comparable to the cell).
At 10M the auto resolution is R=256 (0.39 m cells, certified steady
state); the boost to R=512 (0.195 m cells) is refused by the occupancy
gate. Here we measure whether a short full-resolution PRE-FINE RUNG at
R=256 (plane mode — converges to noise level, pose residual ≪ 0.195 m)
lets a subsequent R=512 fine level run certified:

  A: fine point loop at auto R=256 (the round-2 30.1M pts/s row).
  B: fine point loop FORCED R=512 straight off the ladder (expected
     repair-bound — the control).
  C: 5-iteration R=256 plane pre-rung, then point fine at R=512.
  D: same pre-rung, then PLANE fine at R=512 (the recommended 10M
     production mode).
"""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = int(os.environ.get("EXP_N", 10_000_000))
ITERS = int(os.environ.get("EXP_ITERS", 20))

_t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - _t0:8.3f}s] {msg}", flush=True)


def main():
    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    log("pair generated")

    coarse = icp_register_multiscale(
        src, tgt, dtype=jnp.float32, nn_backend="pallas",
        estimator="plane", max_iterations=8, tolerance=1e-7,
        return_registered=False,
    ).final
    log(f"ladder init rmse={coarse.rmse:.4f}")

    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgt_local = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgt_local)
    src_dev = jax.device_put((src - offset).astype(np.float32))
    jax.block_until_ready((src_dev, tgt_dev))

    base_R = pn.auto_resolution_data(tgt_local)
    tr256 = pn.auto_trange(tgt_local, base_R)
    tr512 = pn.auto_trange(tgt_local, 2 * base_R)
    log(f"base R={base_R} trange={tr256}; boosted R={2*base_R} "
        f"trange={tr512}")

    # Separate factories per estimator (icp_register pins the match).
    prep256p = pn.make_pallas_nn_device(
        tgt_local, resolution=base_R, trange=tr256, target_dev=tgt_dev,
    )
    prep512p = pn.make_pallas_nn_device(
        tgt_local, resolution=2 * base_R, trange=tr512,
        target_dev=tgt_dev,
    )
    prep256n = pn.make_pallas_nn_device(
        tgt_local, resolution=base_R, trange=tr256, target_dev=tgt_dev,
        with_normals=True,
    )
    prep512n = pn.make_pallas_nn_device(
        tgt_local, resolution=2 * base_R, trange=tr512,
        target_dev=tgt_dev, with_normals=True,
    )
    log("grids built (256 + 512, point + plane)")

    def fine(prepared, T0, iters, estimator, label, reps=2):
        kw = dict(
            dtype=jnp.float32, prepared_nn=prepared,
            device_data=(src_dev, tgt_dev, offset),
            initial_transform=T0, estimator=estimator,
            max_iterations=iters, tolerance=0.0, return_registered=False,
            segment_iterations=0,
        )
        res = icp_register(src, tgt, **kw)  # warm/compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = icp_register(src, tgt, **kw)
            times.append(time.perf_counter() - t0)
        el = min(times)
        log(f"[{label}] {el:.3f}s for {iters} iters "
            f"({el/iters*1e3:.1f} ms/iter incl fixed; "
            f"{N*iters/el/1e6:.1f}M pts/s) rmse={res.rmse:.4f}")
        return res

    # A: auto R=256 point (reference row).
    fine(prep256p, coarse.transform, ITERS, "point", "A: R=256 point")

    # B: forced R=512 point straight off the ladder (control).
    fine(prep512p, coarse.transform, ITERS, "point",
         "B: R=512 point, ladder handoff")

    # C/D: R=256 plane pre-rung tightens the pose to noise level first.
    pre = fine(prep256n, coarse.transform, 5, "plane",
               "pre-rung: R=256 plane x5")
    fine(prep512p, pre.transform, ITERS, "point",
         "C: R=512 point after pre-rung")
    fine(prep512n, pre.transform, ITERS, "plane",
         "D: R=512 plane after pre-rung")


if __name__ == "__main__":
    main()
