"""Does a denser intermediate level rescue a stalled coarse pass?

Seed-9 uniform volume at 1M: the stride-34 coarse level stalls at RMSE
2.33 (point-to-point on a sparse random volume — reference-faithful
weak basin), and the fine zcol level then starts far beyond its z-cell
and spends every iteration in the repair chain. Test: continue from the
stalled pose at intermediate strides and see where point-to-point can
still pull the pose in.

MEASURED ANSWER (2026-08-20, v5e): it cannot. The stalled pose is
17.5 m off (10° yaw at 100 m extent) and stays 15-16 m off at strides
12/6/3 and after 60 coarse iterations — a true local minimum of
point-to-point ICP on a featureless uniform box, not a ladder-density
problem. The reference would stall identically (same semantics, same
basin); no adaptive-ladder insertion is warranted. bench.py's volume
row therefore uses the convergent seed-7 workload (the SCALING.md
density-table run); the exact-repair chain keeps the stalled case
correct (exact 1-NN throughout), just slow — 549k pts/s measured."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax.numpy as jnp  # noqa: E402

N = int(os.environ.get("EXP_N", 1_000_000))
SEED = int(os.environ.get("EXP_SEED", 9))

_t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - _t0:8.3f}s] {msg}", flush=True)


def main():
    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.ops.se3 import registration_error
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    src, tgt, T_true = make_registration_pair(
        n=N, seed=SEED, noise_sigma=0.02, kind="uniform", extent=100.0
    )

    def err(T):
        return float(registration_error(
            jnp.asarray(T, jnp.float32), jnp.asarray(T_true, jnp.float32),
            jnp.asarray(src[:50_000], jnp.float32)))

    coarse = icp_register(
        src[::34], tgt[::34], dtype=jnp.float32, max_iterations=15,
        tolerance=1e-4, return_registered=False,
    )
    log(f"stride34: rmse={coarse.rmse:.4f} err={err(coarse.transform):.4f}")

    T = coarse.transform
    for stride in (12, 6, 3):
        r = icp_register(
            src[::stride], tgt[::stride], dtype=jnp.float32,
            initial_transform=T, max_iterations=15, tolerance=1e-4,
            return_registered=False,
        )
        log(f"stride{stride} (from stalled): rmse={r.rmse:.4f} "
            f"err={err(r.transform):.4f} iters={r.iterations} {r.message}")

    # Also: does more coarse *iterations* alone fix it?
    c2 = icp_register(
        src[::34], tgt[::34], dtype=jnp.float32, max_iterations=60,
        tolerance=1e-6, return_registered=False,
    )
    log(f"stride34 x60 iters: rmse={c2.rmse:.4f} err={err(c2.transform):.4f} "
        f"iters={c2.iterations} {c2.message}")

    # And: continue the cascade 12 -> fine start error
    r12 = icp_register(
        src[::12], tgt[::12], dtype=jnp.float32,
        initial_transform=coarse.transform, max_iterations=15,
        tolerance=1e-4, return_registered=False,
    )
    r3 = icp_register(
        src[::3], tgt[::3], dtype=jnp.float32,
        initial_transform=r12.transform, max_iterations=15, tolerance=1e-4,
        return_registered=False,
    )
    log(f"cascade 34->12->3: rmse={r3.rmse:.4f} err={err(r3.transform):.4f}")


if __name__ == "__main__":
    main()
