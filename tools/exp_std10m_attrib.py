"""Attribute the standard (multiscale) 10M registration's fixed costs.

Wraps the stage functions the pipeline calls (grid factory, layout,
per-level icp_register, device_put uploads) with wall-clock logging, then
runs one warm full registration. The fine loop itself is known flat
(SCALING.md: ~333-404 ms/iter at 10M); this attributes everything else.
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


def wrap(mod, name, label=None):
    fn = getattr(mod, name)
    lab = label or name

    def wrapped(*a, **k):
        t = time.perf_counter()
        out = fn(*a, **k)
        log(f"{lab}: {time.perf_counter() - t:.3f}s")
        return out

    setattr(mod, name, wrapped)
    return fn


def main():
    from iterativeclosestpoint_tpu.models import icp as icp_mod
    from iterativeclosestpoint_tpu.models import multiscale as ms_mod
    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    log("pair generated")

    wrap(pn, "make_pallas_nn_device")
    wrap(pn, "build_pallas_grid")
    wrap(pn, "auto_trange")
    orig_reg = icp_mod.icp_register

    def reg_logged(s, t_, **kw):
        t = time.perf_counter()
        out = orig_reg(s, t_, **kw)
        log(f"icp_register(n={len(s)}, iters={out.iterations}): "
            f"{time.perf_counter() - t:.3f}s")
        return out

    icp_mod.icp_register = reg_logged
    ms_mod.icp_register = reg_logged

    orig_put = jax.device_put

    def put_logged(x, *a, **k):
        t = time.perf_counter()
        out = jax.block_until_ready(orig_put(x, *a, **k))
        sz = sum(
            getattr(l, "nbytes", 0) for l in jax.tree_util.tree_leaves(x)
        )
        log(f"device_put({sz / 1e6:.0f} MB): {time.perf_counter() - t:.3f}s")
        return out

    jax.device_put = put_logged
    ms_mod._jax = jax

    kwargs = dict(
        coarse_max_points=30_000, coarse_iterations=15,
        max_iterations=ITERS, tolerance=0.0, dtype=jnp.float32,
        nn_backend="pallas", estimator="plane", return_registered=False,
    )
    log("=== warm run (compiles) ===")
    icp_register_multiscale(src, tgt, **kwargs)
    log("=== timed run ===")
    t = time.perf_counter()
    res = icp_register_multiscale(src, tgt, **kwargs)
    el = time.perf_counter() - t
    log(f"TOTAL: {el:.3f}s -> {N * ITERS / el:,.0f} pts/s "
        f"rmse={res.final.rmse:.4f}")


if __name__ == "__main__":
    main()
