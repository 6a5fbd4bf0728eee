"""Ground-truth repair-traffic census from INSIDE the compiled fine loop
(ICP_DEBUG_REPAIR=1): what n_bad0 / n_bad_t2 the production dispatch
actually computes per iteration at the 1M bench steady state — the
replayed-pose census (exp_decert_census) disagrees with the trace's
firing pattern, so measure at the source."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
os.environ["ICP_DEBUG_REPAIR"] = "1"

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    N = 1_000_000
    print(f"devices: {jax.devices()}", flush=True)
    src, tgt, _ = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    kwargs = dict(
        coarse_max_points=30_000, coarse_iterations=15, max_iterations=20,
        tolerance=0.0, dtype=jnp.float32, nn_backend="pallas",
        return_registered=False,
    )
    res = icp_register_multiscale(src, tgt, **kwargs)
    print(f"rmse={res.final.rmse:.6f}", flush=True)


if __name__ == "__main__":
    main()
