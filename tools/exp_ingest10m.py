"""Round-4 W2 measurement: the streamed-ingest partitioned path with the
certified Pallas kernel chain (sampled grid params) at scale.

Two measurements:
  1. 1M A/B — ingest-brute (the round-3 state) vs ingest-pallas on the
     same PartitionState: the unlock factor.
  2. 10M ingest-pallas end-to-end (files → walls → sampled params →
     coarse carry → streamed load → registration), pts/s/chip; the
     brute form at 10M is O(N·M)=1e14 pair ops/iteration on the
     1-device mesh and is not runnable — that is the point of the fix.
"""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterativeclosestpoint_tpu.io.las import read_header, write_las  # noqa: E402
from iterativeclosestpoint_tpu.parallel.ingest import (  # noqa: E402
    coarse_carry_from_files,
    estimate_partition_grid_params,
    header_center,
    load_las_partitioned_source,
    load_las_partitioned_target,
    sample_x_walls,
)
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh  # noqa: E402
from iterativeclosestpoint_tpu.parallel.partition import (  # noqa: E402
    icp_register_partitioned,
)
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    make_registration_pair,
)

ITERS = int(os.environ.get("EXP_ITERS", 20))


def run_case(n, tmpdir, iters, modes):
    src, tgt, _ = make_registration_pair(
        n=n, seed=7, noise_sigma=0.02, kind="terrain", extent=100.0
    )
    sp, tp = f"{tmpdir}/s{n}.las", f"{tmpdir}/t{n}.las"
    t0 = time.perf_counter()
    write_las(sp, src)
    write_las(tp, tgt)
    print(f"[{n}] wrote LAS files ({time.perf_counter()-t0:.1f}s)",
          flush=True)
    del src, tgt

    mesh = make_mesh()
    hdr_t = read_header(tp)
    offset = header_center(hdr_t)
    walls, _ = sample_x_walls(tp, mesh.devices.size, header=hdr_t)
    ext = float(np.max(np.asarray(hdr_t.bounds_max, np.float64)
                       - np.asarray(hdr_t.bounds_min, np.float64)))
    halo = 0.02 * ext

    t0 = time.perf_counter()
    carry = coarse_carry_from_files(sp, tp)
    print(f"[{n}] coarse carry ({time.perf_counter()-t0:.1f}s)", flush=True)
    gp = estimate_partition_grid_params(
        tp, walls, halo, header=hdr_t,
        n_queries_hint=read_header(sp).point_count,
    )
    print(f"[{n}] grid params: {gp}", flush=True)

    t0 = time.perf_counter()
    part, walls = load_las_partitioned_target(
        tp, mesh, halo=halo, offset=offset, walls=walls,
    )
    src_g = load_las_partitioned_source(
        sp, mesh, walls=walls, offset=offset,
    )
    print(f"[{n}] streamed load+upload ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    for mode in modes:
        # Brute at 1M on the 1-device mesh is ~30 s of device time PER
        # ITERATION (1e12 pairs): segment to 1-iteration programs (the
        # TPU worker watchdog kills multi-minute programs) and rate it
        # from a few iterations.
        m_iters = iters if mode == "pallas" else min(iters, 4)
        kw = dict(
            mesh=mesh, partition_state=part, source_global=src_g,
            offset=offset, resume_carry=carry, dtype=jnp.float32,
            max_iterations=m_iters, tolerance=0.0,
            return_registered=False,
            segment_iterations=0 if mode == "pallas" else 1,
        )
        if mode == "pallas":
            kw["grid_params"] = gp
        res = icp_register_partitioned(None, None, **kw)  # warm
        print(f"[{n}][{mode}] warm: iters={res.iterations} "
              f"rmse={res.rmse:.4f}", flush=True)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = icp_register_partitioned(None, None, **kw)
            times.append(time.perf_counter() - t0)
        el = min(times)
        print(f"[{n}][{mode}] best: {el:.3f}s -> {n*m_iters/el:,.0f} "
              f"pts/s/chip ({el/m_iters*1e3:.1f} ms/iter) "
              f"rmse={res.rmse:.4f}", flush=True)


def main():
    import tempfile

    print("devices:", jax.devices(), flush=True)
    with tempfile.TemporaryDirectory() as td:
        run_case(1_000_000, td, ITERS, modes=("brute", "pallas"))
        if os.environ.get("EXP_10M", "1") == "1":
            run_case(10_000_000, td, ITERS, modes=("pallas",))


if __name__ == "__main__":
    main()
