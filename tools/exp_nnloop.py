"""TPU probe: in-loop NN kernel cost at a registered steady pose.

Scan-differenced fori-loop probes (result-dependent drift defeats
loop-invariant hoisting): NN-only vs NN+stats+Kabsch+apply, at EXP_N.
Also prints the fine-kernel certification rate at the steady pose and,
with EXP_DECOMPOSE=1, the breakdown of decertification causes.
"""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterativeclosestpoint_tpu.models.icp import (  # noqa: E402
    _kabsch_global,
    icp_register,
    iteration_statistics,
)
from iterativeclosestpoint_tpu.models.multiscale import (  # noqa: E402
    icp_register_multiscale,
)
from iterativeclosestpoint_tpu.ops import pallas_nn as pn  # noqa: E402
from iterativeclosestpoint_tpu.ops.se3 import apply_transform  # noqa: E402
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    make_registration_pair,
)

N = int(os.environ.get("EXP_N", 1_000_000))
ITERS = 20


def sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[-1])[:1])


def timeit(fn, reps=3):
    sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)

    print("registering to steady state (multiscale ladder)...", flush=True)
    res = icp_register_multiscale(
        src, tgt, dtype=jnp.float32, nn_backend="pallas",
        estimator="plane", max_iterations=10, tolerance=1e-7,
        return_registered=True,
    )
    q = (res.final.source_registered - offset).astype(np.float32)

    slabs = 4
    R = pn.auto_resolution_data(tgtl)
    trange = pn.auto_trange(tgtl, R)
    nn_fn, state, R = pn.make_pallas_nn_device(
        tgtl, resolution=R, trange=trange, slabs=slabs, target_dev=tgt_dev)
    grid = state[0]
    rows, weight = pn.grouped_tile_order_device(
        jnp.asarray(q), grid.origin, grid.cell_size, resolution=R)
    q_dev = jnp.asarray(q)[rows]
    w_dev = weight.astype(jnp.float32)
    sync(q_dev)
    print(f"N={N} R={R} trange={trange} rows={q_dev.shape}", flush=True)

    # Steady-pose certification rate of the bare fine kernel.
    # nn_colsweep is itself jitted with the grid as an ARGUMENT — never
    # close over the grid in an outer jit (at 10M the 330 MB tgt_t would
    # be baked into the HLO as a constant and blow the remote-compile
    # request limit).
    m3, nrm, d, cert = pn.nn_colsweep(
        q_dev, grid, resolution=R, slabs=slabs, trange=trange
    )
    cert_np = np.asarray(cert)
    w_np = np.asarray(w_dev) > 0
    print(f"steady-pose fine-kernel cert rate: {cert_np[w_np].mean():.4f}",
          flush=True)

    sig = jnp.asarray(3.0, jnp.float32)

    def mk_loop(level: int):
        @jax.jit
        def run(q0, w, state_, tgt_):
            def body(i, carry):
                qq, acc = carry
                with jax.default_matmul_precision("highest"):
                    m, dd = nn_fn(qq, tgt_, state_)
                    if level == 0:
                        qq2 = qq + 1e-6 * (m - qq)
                        return (qq2, acc + dd[0])
                    stats = iteration_statistics(
                        dd, w, sig, False, jnp.asarray(False), lambda x: x)
                    _, _, _, valid, _, rmse, _ = stats
                    T = _kabsch_global(qq, m, valid, lambda x: x)
                    qq2 = apply_transform(T, qq)
                    return (qq2, acc + rmse)

            return jax.lax.fori_loop(0, ITERS, body, (q0, 0.0))

        return run

    for lvl, name in ((0, "nn-only"), (1, "nn+stats+kabsch+apply")):
        run = mk_loop(lvl)
        dt = timeit(lambda: run(q_dev, w_dev, state, tgt_dev)) / ITERS
        print(f"loop[{name}]: {dt*1e3:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
