"""Attribute the BLENDED pipeline's wall time: unsynced stage collection
(stalls land in whichever stage the host blocks in), A/B of the
coarse-first upload reorder, and coarse-iteration sensitivity."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.runtime.timing import collect
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    N = 1_000_000
    ITERS = 20
    log(f"devices: {jax.devices()}")
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    kwargs = dict(
        coarse_max_points=30_000, coarse_iterations=15, max_iterations=ITERS,
        tolerance=0.0, dtype=jnp.float32, nn_backend="pallas",
        return_registered=False,
    )
    log("== warmup (coarse-first on) ==")
    t0 = time.perf_counter()
    icp_register_multiscale(src, tgt, **kwargs)
    log(f"warmup {time.perf_counter()-t0:.1f}s")

    def blended(tag, reps=4):
        times = []
        for i in range(reps):
            with collect(sync=False) as col:
                t0 = time.perf_counter()
                icp_register_multiscale(src, tgt, **kwargs)
                dt = time.perf_counter() - t0
            times.append(dt)
            log(f"[{tag}] run {i}: {dt:.3f}s | " + " | ".join(col.lines()))
        log(f"[{tag}] min {min(times):.3f}s")

    blended("coarse_first")

    os.environ["ICP_COARSE_FIRST"] = "0"
    log("== warmup (coarse-first OFF — old order) ==")
    t0 = time.perf_counter()
    icp_register_multiscale(src, tgt, **kwargs)
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    blended("old_order")
    os.environ["ICP_COARSE_FIRST"] = "1"


if __name__ == "__main__":
    main()
