"""Round-5: PRODUCTION-path validation of the two-stage boosted fine
level at 10M — plain icp_register_multiscale(estimator="plane"), which
should now engage the base→boosted schedule automatically (boost
occupancy 19 at 10M: refused by the 32 gate, cleared by the 16 floor).
Compare wall + ms/iter against the single-stage form (grid_resolution
pinned to base)."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = int(os.environ.get("EXP_N", 10_000_000))
ITERS = 20
_t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - _t0:8.3f}s] {msg}", flush=True)


def main():
    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    log("pair generated")

    for label, extra in (
        ("two-stage auto", {}),
        ("single-stage base", {"grid_resolution": 256}),
    ):
        kw = dict(
            dtype=jnp.float32, nn_backend="pallas", estimator="plane",
            max_iterations=ITERS, tolerance=0.0, return_registered=False,
            **extra,
        )
        res = icp_register_multiscale(src, tgt, **kw)
        log(f"[{label}] warm rmse={res.final.rmse:.4f} "
            f"iters={res.final.iterations} "
            f"nn_res={res.final.nn_resolution}")
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = icp_register_multiscale(src, tgt, **kw)
            times.append(time.perf_counter() - t0)
        el = min(times)
        log(f"[{label}] {el:.3f}s blended for {ITERS} fine iters "
            f"-> {N*ITERS/el/1e6:.1f}M pts/s blended")


if __name__ == "__main__":
    main()
