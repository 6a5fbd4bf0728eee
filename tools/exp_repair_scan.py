"""Round-5: joint scan of (fused chunk width) x (coarse repair trange)
on the 1M point-mode fine loop. The chunk=3072 single-chunk form is +9%
STANDALONE but regressed the in-loop kernel 14.3 -> 16.9 ms/iter
(trace3), and coarse trange 6144 (auto) cut the small-stage cost 2.7x
but pushed overflow tiles into the every-iteration brute tier. Measure
the matrix in one process (prep once, est-tuple override per config)."""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 1_000_000
ITERS = 20


def log(msg):
    print(msg, flush=True)


def main():
    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    log(f"devices: {jax.devices()}")
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgt_local = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgt_local)
    src_dev = jax.device_put((src - offset).astype(np.float32))

    stride = max(1, -(-N // 30_000))
    coarse = icp_register(
        src[::stride], tgt[::stride], dtype=jnp.float32,
        max_iterations=15, tolerance=1e-4, return_registered=False,
    )
    log(f"coarse rmse={coarse.rmse:.4f}")

    R, tr, _, base, _ = pn.estimate_grid_params(tgt_local)
    log(f"R={R} trange={tr} base={base}")

    orig_chunk = pn.fused_sweep_chunk
    for ct in (16384, 8192, 6144):
        for chunk in (2048, 3072):
            pn.fused_sweep_chunk = (
                orig_chunk if chunk != 2048 else (lambda s, t: 2048)
            )
            prepared = pn.make_pallas_nn_device(
                tgt_local, target_dev=tgt_dev,
                est=(R, tr, ct, base, None),
            )
            kw = dict(
                dtype=jnp.float32, prepared_nn=prepared,
                device_data=(src_dev, tgt_dev, offset),
                initial_transform=coarse.transform,
                max_iterations=ITERS, tolerance=0.0,
                return_registered=False,
            )
            res = icp_register(src, tgt, **kw)  # warm/compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = icp_register(src, tgt, **kw)
                times.append(time.perf_counter() - t0)
            el = min(times)
            log(f"coarse_trange={ct:5d} chunk={chunk}: "
                f"{el/ITERS*1e3:5.1f} ms/iter  rmse={res.rmse:.6f}")
    pn.fused_sweep_chunk = orig_chunk


if __name__ == "__main__":
    main()
