"""Subprocess worker for tests/test_multihost.py.

Runs as one of N ``jax.distributed`` CPU processes (Gloo collectives over
localhost): initializes the 2-D (hosts × chips) mesh via
``parallel.mesh.init_multihost`` and checks that the DCN×ICI-sharded ICP
trajectory equals the single-device one — the mechanical multi-host test
SURVEY.md §5 calls for (no TPU pod required).
"""

import os
import sys

# Invoked as ``python tests/_multihost_worker.py`` — the script dir
# (tests/) is on sys.path, the repo root is not; make the package
# importable whether or not it is pip-installed.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from iterativeclosestpoint_tpu.parallel.mesh import init_multihost

    mesh = init_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert mesh.axis_names == ("host", "chip"), mesh.axis_names
    assert mesh.devices.shape == (nproc, 2), mesh.devices.shape

    import jax.numpy as jnp
    import numpy as np

    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.parallel.sharded import (
        icp_register_sharded,
    )
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    src, tgt, _ = make_registration_pair(n=1001, seed=50, noise_sigma=0.02)
    res_n = icp_register_sharded(
        src, tgt, mesh=mesh, dtype=jnp.float64, max_iterations=12,
        return_registered=True,
    )
    # Per-process single-device reference (local arrays only — legal in
    # multi-controller mode).
    res_1 = icp_register(
        src, tgt, dtype=jnp.float64, nn_backend="bruteforce",
        max_iterations=12,
    )
    assert res_n.iterations == res_1.iterations, (
        res_n.iterations, res_1.iterations
    )
    assert res_n.message == res_1.message
    np.testing.assert_array_equal(res_n.history_valid, res_1.history_valid)
    np.testing.assert_allclose(res_n.history_rmse, res_1.history_rmse,
                               rtol=1e-12)
    np.testing.assert_allclose(res_n.transform, res_1.transform, atol=1e-12)
    np.testing.assert_allclose(
        res_n.source_registered, res_1.source_registered, atol=1e-10
    )

    # Plane estimator over the 2-D mesh (the 6×6 psum rides DCN too).
    res_p = icp_register_sharded(
        src, tgt, mesh=mesh, dtype=jnp.float64, max_iterations=8,
        estimator="plane", return_registered=False,
    )
    res_p1 = icp_register(
        src, tgt, dtype=jnp.float64, max_iterations=8, estimator="plane",
        return_registered=False,
    )
    np.testing.assert_allclose(res_p.history_rmse, res_p1.history_rmse,
                               rtol=1e-12)

    # Per-host sharded ingest (round-2 verdict W4): each process decodes
    # ONLY its addressable row ranges from the LAS file — assert no
    # single decode (and not even this process's total) reached the full
    # cloud — and the trajectory still matches the full-array reference.
    las_dir = sys.argv[4] if len(sys.argv) > 4 else ""
    if las_dir:
        from iterativeclosestpoint_tpu.io.las import read_las
        from iterativeclosestpoint_tpu.parallel.ingest import load_las_sharded
        from iterativeclosestpoint_tpu.utils.hostmath import center_offset

        src_path = os.path.join(las_dir, "src.las")
        stats = {}
        offset = center_offset(tgt)
        src_g, w_g, n_rows, _hdr = load_las_sharded(
            src_path, mesh, offset=offset, dtype=np.float64, stats=stats
        )
        n_local_shards = sum(
            1 for d in mesh.devices.ravel()
            if d.process_index == jax.process_index()
        )
        shard_rows = src_g.shape[0] // mesh.devices.size
        assert stats["peak_rows"] <= shard_rows, stats
        assert stats["total_rows"] <= n_local_shards * shard_rows, stats
        assert stats["total_rows"] < n_rows, stats  # never the full cloud

        res_i = icp_register_sharded(
            None, tgt, mesh=mesh, dtype=jnp.float64, max_iterations=12,
            source_global=(src_g, w_g, n_rows), return_registered=True,
        )
        src_dec, _ = read_las(src_path)
        res_r = icp_register(
            src_dec, tgt, dtype=jnp.float64, nn_backend="bruteforce",
            max_iterations=12,
        )
        assert res_i.iterations == res_r.iterations
        np.testing.assert_allclose(res_i.history_rmse, res_r.history_rmse,
                                   rtol=1e-12)
        np.testing.assert_allclose(res_i.transform, res_r.transform,
                                   atol=1e-12)
        np.testing.assert_allclose(
            res_i.source_registered, res_r.source_registered, atol=1e-10
        )
        print(f"INGEST_OK {pid} peak={stats['peak_rows']} "
              f"total={stats['total_rows']} n={n_rows}", flush=True)

        # Partitioned-target streamed ingest across processes: slab walls
        # from a file sample, each process retains ONLY its devices'
        # slabs/shards, and the trajectory equals the single-device one.
        from iterativeclosestpoint_tpu.parallel.ingest import (
            header_center,
            load_las_partitioned_source,
            load_las_partitioned_target,
        )
        from iterativeclosestpoint_tpu.io.las import read_header
        from iterativeclosestpoint_tpu.parallel.mesh import make_mesh
        from iterativeclosestpoint_tpu.parallel.partition import (
            icp_register_partitioned,
        )

        tgt_path = os.path.join(las_dir, "tgt.las")
        pmesh = make_mesh(axis_names=("dp",), devices=jax.devices())
        offset = header_center(read_header(tgt_path))
        tstats, sstats = {}, {}
        part, walls = load_las_partitioned_target(
            tgt_path, pmesh, halo=2.0, offset=offset, dtype=np.float64,
            batch_size=500, stats=tstats,
        )
        src_g, w_g, n_rows_p = load_las_partitioned_source(
            src_path, pmesh, walls=walls, offset=offset, dtype=np.float64,
            batch_size=500, stats=sstats,
        )
        assert tstats["peak_batch_rows"] <= 500, tstats
        # This process retained only ~half the cloud (its 2 of 4 slabs,
        # plus halo overlap).
        assert tstats["retained_rows"] < tstats["total_rows"], tstats
        assert sstats["retained_rows"] < sstats["total_rows"], sstats

        res_pi = icp_register_partitioned(
            None, None, mesh=pmesh, partition_state=part,
            source_global=(src_g, w_g, n_rows_p), offset=offset,
            dtype=jnp.float64, max_iterations=12, return_registered=False,
        )
        tgt_dec, _ = read_las(tgt_path)
        res_pr = icp_register(
            src_dec, tgt_dec, dtype=jnp.float64, nn_backend="bruteforce",
            max_iterations=12, return_registered=False,
        )
        assert res_pi.iterations == res_pr.iterations
        np.testing.assert_allclose(res_pi.history_rmse,
                                   res_pr.history_rmse, rtol=1e-12)
        np.testing.assert_allclose(res_pi.transform, res_pr.transform,
                                   atol=1e-12)
        print(f"PARTITION_INGEST_OK {pid} retained="
              f"{tstats['retained_rows']}/{tstats['total_rows']}",
              flush=True)

        # Sampled grid params unlock the certified Pallas kernel chain on
        # the streamed-ingest path (round-3 verdict W2): same trajectory
        # as the exact brute run above within the kernel's f32 envelope,
        # computed with no process ever holding a slab.
        from iterativeclosestpoint_tpu.parallel.ingest import (
            estimate_partition_grid_params,
        )

        gp = estimate_partition_grid_params(
            tgt_path, walls, halo=2.0, grid_resolution=8
        )
        assert gp["local_search"] == "pallas"
        res_pp = icp_register_partitioned(
            None, None, mesh=pmesh, partition_state=part,
            source_global=(src_g, w_g, n_rows_p), offset=offset,
            dtype=jnp.float64, max_iterations=12, return_registered=False,
            grid_params=gp,
        )
        assert res_pp.iterations == res_pr.iterations
        np.testing.assert_allclose(res_pp.history_rmse,
                                   res_pr.history_rmse, rtol=1e-5)
        np.testing.assert_allclose(res_pp.transform, res_pr.transform,
                                   atol=1e-5)
        print(f"PARTITION_PALLAS_OK {pid} gp={gp}", flush=True)

    print(f"MULTIHOST_OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
