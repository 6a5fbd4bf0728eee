"""Per-stage probe of the fine-level icp_register at 10M (plane mode,
prepared grids + device data — the multiscale fine call): attributes the
gap between the measured ~400 ms/iter segment loop and the observed
~28 s warm fine call."""

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
    from iterativeclosestpoint_tpu.models import icp as icp_mod
    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.ops.pallas_nn import make_pallas_nn_device
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
    src_al = src @ coarse.transform[:3, :3].T + coarse.transform[:3, 3]
    src_dev = jax.device_put((src_al - offset).astype(np.float32))
    tgt_local = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgt_local)
    prepared = make_pallas_nn_device(
        tgt_local, target_dev=tgt_dev, with_normals=True
    )
    jax.block_until_ready(src_dev)
    log("device data + prepared grids ready")

    orig_core = icp_mod._icp_core
    orig_prep = icp_mod._prep_fine_source
    orig_pkg = icp_mod.package_result

    def core_logged(*a, **k):
        t = time.perf_counter()
        out = orig_core(*a, **k)
        jax.block_until_ready(out["T_cum"])
        log(f"  _icp_core dispatch({k.get('max_iterations')} iters): "
            f"{time.perf_counter() - t:.3f}s")
        return out

    def prep_logged(*a, **k):
        t = time.perf_counter()
        out = orig_prep(*a, **k)
        jax.block_until_ready(out[0])
        log(f"  _prep_fine_source: {time.perf_counter() - t:.3f}s")
        return out

    def pkg_logged(*a, **k):
        t = time.perf_counter()
        out = orig_pkg(*a, **k)
        log(f"  package_result: {time.perf_counter() - t:.3f}s")
        return out

    icp_mod._icp_core = core_logged
    icp_mod._prep_fine_source = prep_logged
    icp_mod.package_result = pkg_logged

    kwargs = dict(
        dtype=jnp.float32, estimator="plane", max_iterations=ITERS,
        tolerance=0.0, return_registered=False,
        device_data=(src_dev, tgt_dev, offset), prepared_nn=prepared,
    )
    log("=== warm run ===")
    icp_register(src_al, tgt, **kwargs)
    log("=== timed run ===")
    t = time.perf_counter()
    res = icp_register(src_al, tgt, **kwargs)
    el = time.perf_counter() - t
    log(f"fine icp_register TOTAL: {el:.3f}s "
        f"({el / ITERS * 1e3:.0f} ms/iter) rmse={res.rmse:.4f}")


if __name__ == "__main__":
    main()
