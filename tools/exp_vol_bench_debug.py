"""Debug the bench.py volume row: the multiscale auto path measured
568k pts/s / rmse 0.76 on the uniform-volume 1M workload, while
tools/exp_volume.py (explicit prepared zcol kernel) measures 16.6M and
converges. Attribute the difference stage by stage."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = int(os.environ.get("EXP_N", 1_000_000))
ITERS = 20
SEED = int(os.environ.get("EXP_SEED", 9))

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

    log(f"devices: {jax.devices()}")
    src, tgt, T_true = make_registration_pair(
        n=N, seed=SEED, noise_sigma=0.02, kind="uniform", extent=100.0
    )
    log(f"pair: extent z {tgt[:,2].min():.2f}..{tgt[:,2].max():.2f}")

    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    R = pn.auto_resolution_data(tgtl)
    tr = pn.auto_trange(tgtl, R)
    zr = pn.auto_zrange(tgtl, R)
    pad = 1.0 + (R**2 * 127 / 2) / N
    log(f"auto: R={R} trange={tr} zrange={zr} pad={pad:.3f} "
        f"zcol_cost={12*zr*pad:.0f} sweep_cost={0.7*4*tr:.0f} "
        f"-> auto kernel = "
        f"{'zcol' if (tr >= 2048 and R <= 128 and 12*zr*pad < 0.7*4*tr) else 'sweep'}")

    # Exactly the bench kwargs
    kwargs = dict(
        coarse_max_points=30_000,
        coarse_iterations=15,
        max_iterations=ITERS,
        tolerance=0.0,
        dtype=jnp.float32,
        nn_backend="pallas",
        return_registered=False,
    )
    res = icp_register_multiscale(src, tgt, **kwargs)
    for stride, lev in res.levels:
        log(f"level stride={stride}: iters={lev.iterations} "
            f"rmse={lev.rmse:.4f} msg={lev.message}")
    log(f"warm multiscale: final rmse={res.final.rmse:.4f}")

    t0 = time.perf_counter()
    res = icp_register_multiscale(src, tgt, **kwargs)
    el = time.perf_counter() - t0
    log(f"timed multiscale: {el:.3f}s -> {N*ITERS/el:,.0f} pts/s "
        f"rmse={res.final.rmse:.4f}")

    # Compare: seed-7 (the exp_volume seed) same call
    src7, tgt7, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="uniform", extent=100.0
    )
    res7 = icp_register_multiscale(src7, tgt7, **kwargs)
    t0 = time.perf_counter()
    res7 = icp_register_multiscale(src7, tgt7, **kwargs)
    el7 = time.perf_counter() - t0
    log(f"seed7 multiscale: {el7:.3f}s -> {N*ITERS/el7:,.0f} pts/s "
        f"rmse={res7.final.rmse:.4f}")


if __name__ == "__main__":
    main()
