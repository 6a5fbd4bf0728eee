"""Session / metrics / checkpoint / CLI end-to-end tests (product surface
C6-C16)."""

import json

import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.cli import main as cli_main
from iterativeclosestpoint_tpu.io.las import read_las, write_las
from iterativeclosestpoint_tpu.runtime.checkpoint import (
    load_checkpoint,
    resume_arguments,
    save_checkpoint,
)
from iterativeclosestpoint_tpu.runtime.metrics import (
    MetricsWriter,
    read_history_json,
    write_history_json,
)
from iterativeclosestpoint_tpu.runtime.session import RegistrationSession
from iterativeclosestpoint_tpu.utils.config import AppSettings, ICPConfig
from iterativeclosestpoint_tpu.utils.synth import make_registration_pair


def _session_with_pair(tmp_path, n=1500, seed=100):
    src, tgt, T = make_registration_pair(n=n, seed=seed, noise_sigma=0.01)
    sp = tmp_path / "src.las"
    tp = tmp_path / "tgt.las"
    write_las(sp, src)
    write_las(tp, tgt)
    sess = RegistrationSession()
    sess.load_source(sp)
    sess.load_target(tp)
    return sess, sp, tp, T


def test_session_run_and_artifacts(tmp_path):
    sess, sp, tp, _ = _session_with_pair(tmp_path)
    cfg = ICPConfig(max_iterations=15, nn_backend="bruteforce")
    res = sess.run(config=cfg, checkpoint_path=tmp_path / "ckpt.json")
    assert res.success and res.iterations >= 1
    assert len(sess.history) == 1

    out = tmp_path / "registered.las"
    sess.save_result(out)
    back, hdr = read_las(out)
    # Georeference preserved: same scale/offset as the source file.
    assert hdr.scale == sess.source_header.scale
    np.testing.assert_allclose(back, sess.source, atol=0.001)

    sess.save_report(txt_path=tmp_path / "t.txt", json_path=tmp_path / "t.json")
    txt = (tmp_path / "t.txt").read_text()
    assert "P_target = R * P_source + t" in txt
    assert "iteration 1" in txt
    hist = read_history_json(tmp_path / "t.json")
    assert hist["iterations"] == res.iterations
    np.testing.assert_allclose(hist["transform"], res.transform)

    ckpt = load_checkpoint(tmp_path / "ckpt.json")
    np.testing.assert_allclose(ckpt["transform"], res.transform)


def test_session_replay_trajectory(tmp_path):
    sess, *_ = _session_with_pair(tmp_path)
    res = sess.run(config=ICPConfig(max_iterations=8, nn_backend="bruteforce"))
    assert res.iterations >= 2
    r0 = sess.replay(0)
    np.testing.assert_array_equal(r0, sess.original_source)
    rk = sess.replay(res.iterations)
    T = res.history_transform[-1]
    np.testing.assert_allclose(
        rk, sess.original_source @ T[:3, :3].T + T[:3, 3], atol=1e-9
    )


def test_checkpoint_resume_continues(tmp_path):
    src, tgt, T_true = make_registration_pair(n=1200, seed=101)
    sess = RegistrationSession()
    sess.set_clouds(src, tgt)
    res1 = sess.run(
        config=ICPConfig(max_iterations=3, nn_backend="bruteforce"),
        checkpoint_path=tmp_path / "c.json",
    )
    ckpt = load_checkpoint(tmp_path / "c.json")
    patch = resume_arguments(ckpt, max_iterations=40)
    assert "resume_carry" in patch  # v2 checkpoints carry convergence state
    sess2 = RegistrationSession()
    sess2.set_clouds(src, tgt)  # pristine source + saved carry
    res2 = sess2.run(
        config=ICPConfig(max_iterations=patch["max_iterations"],
                         nn_backend="bruteforce"),
        resume_carry=patch["resume_carry"],
        iteration_base=ckpt["iteration"],
    )
    assert res2.success
    # Combined run converges at least as well as the prefix alone.
    assert res2.rmse <= res1.rmse + 1e-9


def test_metrics_jsonl(tmp_path):
    mpath = tmp_path / "m.jsonl"
    m = MetricsWriter(jsonl_path=mpath, console=False)
    m.event("run", success=True, rmse=0.5)
    m.iteration(
        {"iteration": 1, "rmse": 0.5, "valid_points": 10, "outlier_points": 2,
         "rotation_angle_deg": 1.0, "translation_norm": 0.1,
         "mean_dist": 0.4, "std_dist": 0.1, "threshold": 0.7}, 10,
    )
    m.close()
    rows = [json.loads(x) for x in mpath.read_text().splitlines()]
    assert rows[0]["kind"] == "run"
    assert rows[1]["kind"] == "iteration" and rows[1]["rmse"] == 0.5


def test_cli_end_to_end(tmp_path, capsys):
    sp = tmp_path / "s.las"
    tp = tmp_path / "t.las"
    # synth
    assert cli_main(["synth", str(sp), str(tp), "--n", "1500", "--seed", "3",
                     "--noise", "0.01"]) == 0
    # info
    assert cli_main(["info", str(sp)]) == 0
    out = capsys.readouterr().out
    assert "points:         1500" in out
    # run
    reg = tmp_path / "reg.las"
    hist = tmp_path / "hist.jsonl"
    rc = cli_main([
        "run", str(sp), str(tp), "-o", str(reg),
        "--max-iterations", "10", "--nn-backend", "bruteforce",
        "--history", str(hist), "--checkpoint", str(tmp_path / "ck.json"),
    ])
    assert rc == 0
    assert reg.exists()
    report_json = tmp_path / "reg_transform.json"
    assert report_json.exists()
    # replay
    rp = tmp_path / "replay.las"
    assert cli_main(["replay", str(sp), str(report_json), "-k", "1",
                     "-o", str(rp)]) == 0
    assert rp.exists()
    # status
    assert cli_main(["status", "--history", str(hist)]) == 0
    out = capsys.readouterr().out
    assert "runs: 1" in out
    # settings roundtrip
    spath = tmp_path / "settings.json"
    assert cli_main(["settings", "--settings", str(spath),
                     "--set", "icp.max_iterations=77"]) == 0
    assert AppSettings.load(spath).icp.max_iterations == 77
    # resume path exercises checkpoint loading
    rc = cli_main([
        "run", str(sp), str(tp), "--max-iterations", "5",
        "--nn-backend", "bruteforce", "--resume", str(tmp_path / "ck.json"),
    ])
    assert rc == 0


def test_view_render(tmp_path):
    from iterativeclosestpoint_tpu.runtime.viz import render_registration_png

    src, tgt, _ = make_registration_pair(n=500, seed=120)
    p = tmp_path / "v.png"
    render_registration_png(p, src, tgt, rmse_history=np.array([1.0, 0.5, 0.2]))
    assert p.exists() and p.stat().st_size > 10_000


def test_cli_view(tmp_path):
    sp = tmp_path / "s.las"
    tp = tmp_path / "t.las"
    assert cli_main(["synth", str(sp), str(tp), "--n", "800"]) == 0
    png = tmp_path / "out.png"
    assert cli_main(["view", str(sp), str(tp), "-o", str(png)]) == 0
    assert png.exists()


def test_profiling_reports():
    from iterativeclosestpoint_tpu.runtime.profiling import (
        covariance_kernel_report,
        nn_kernel_report,
    )

    r = nn_kernel_report(1_000_000, 128, 6, 2048, elapsed_s=0.05)
    assert 0 < r.sol <= 2.0  # sane roofline range
    assert "SoL" in r.line()
    c = covariance_kernel_report(1_000_000, elapsed_s=0.001)
    assert c.achieved_gbps > 0


def test_cli_graph(tmp_path, capsys):
    """`icp graph`: multi-scan joint registration at the CLI surface."""
    import json

    import numpy as np

    from iterativeclosestpoint_tpu.io.las import read_las, write_las
    from iterativeclosestpoint_tpu.utils.synth import (
        apply_transform_np,
        make_cloud,
        random_rigid_transform,
    )

    base = make_cloud(3000, seed=21)
    poses = [np.eye(4), random_rigid_transform(seed=31),
             random_rigid_transform(seed=32)]
    paths = []
    for s in range(3):
        p = tmp_path / f"scan{s}.las"
        write_las(p, apply_transform_np(np.linalg.inv(poses[s]), base))
        paths.append(str(p))

    merged = tmp_path / "merged.las"
    pjson = tmp_path / "poses.json"
    rc = cli_main(["graph", *paths, "-o", str(merged), "--poses", str(pjson),
                   "--loop", "--nn-backend", "bruteforce",
                   "--max-iterations", "120"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pose graph:" in out
    d = json.loads(pjson.read_text())
    assert len(d["poses"]) == 3 and len(d["edges"]) == 3  # chain + loop
    # Each recovered pose maps its scan back onto the scene (LAS writer
    # quantizes at the default 0.001 scale).
    for s in range(3):
        scan, _ = read_las(tmp_path / f"scan{s}.las")
        rec = apply_transform_np(np.asarray(d["poses"][s]), scan)
        np.testing.assert_allclose(rec, base, atol=5e-3)
    mpts, _ = read_las(merged)
    assert len(mpts) == 3 * len(base)


def test_session_parallel_modes(tmp_path):
    """`parallel='dp'|'partition'` routes through the multi-device paths
    and matches the single-device trajectory on the virtual mesh."""
    sess, sp, tp, _ = _session_with_pair(tmp_path, seed=101)
    cfg = ICPConfig(max_iterations=12, nn_backend="bruteforce")
    base = sess.run(config=cfg)
    for mode in ("dp", "partition"):
        s2 = RegistrationSession()
        s2.load_source(sp)
        s2.load_target(tp)
        res = s2.run(config=cfg, parallel=mode)
        assert res.success, mode
        assert res.iterations == base.iterations, mode
        np.testing.assert_allclose(res.transform, base.transform,
                                   atol=1e-5, err_msg=mode)


def test_cli_run_parallel(tmp_path):
    sp, tp = tmp_path / "s.las", tmp_path / "t.las"
    assert cli_main(["synth", str(sp), str(tp), "--n", "1200",
                     "--seed", "9"]) == 0
    out = tmp_path / "reg.las"
    rc = cli_main([
        "run", str(sp), str(tp), "-o", str(out), "--parallel", "dp",
        "--max-iterations", "10", "--nn-backend", "bruteforce",
    ])
    assert rc == 0 and out.exists()
    rc = cli_main([
        "run", str(sp), str(tp), "-o", str(out), "--parallel", "partition",
        "--multiscale", "--max-iterations", "10",
    ])
    assert rc == 0


def test_multiscale_partitioned_fine_path():
    """fine_path='partitioned': the ladder's coarse transform pre-aligns
    the partitioned fine level (the 10M production composition)."""
    import jax.numpy as jnp

    from iterativeclosestpoint_tpu.models.multiscale import (
        icp_register_multiscale,
    )
    from iterativeclosestpoint_tpu.ops.se3 import transform_error
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh

    src, tgt, T_true = make_registration_pair(n=3000, seed=102,
                                              noise_sigma=0.01)
    mesh = make_mesh(n_devices=4)
    ms = icp_register_multiscale(
        src, tgt, mesh=mesh, fine_path="partitioned", strides=(8, 1),
        max_iterations=20, return_registered=False,
    )
    assert ms.final.success
    err = float(transform_error(jnp.asarray(ms.transform),
                                jnp.asarray(T_true)))
    assert err < 1e-3, err


def test_grid_resolution_setting_reaches_engine(tmp_path):
    """Round-2 verdict W2: a changed grid_resolution setting must change
    the built grid (observable via ICPResult.nn_resolution + metrics)."""
    sess, _, _, _ = _session_with_pair(tmp_path)
    lines = []
    sess.metrics.log = lambda msg: lines.append(str(msg))

    cfg = ICPConfig(max_iterations=3, nn_backend="cellblock",
                    grid_resolution=16)
    res = sess.run(config=cfg)
    assert res.nn_resolution == 16
    assert any("nn grid resolution: 16" in ln for ln in lines)

    # grid_resolution=0 (default) = data-adaptive auto sizing.
    sess2, _, _, _ = _session_with_pair(tmp_path)
    cfg2 = ICPConfig(max_iterations=3, nn_backend="cellblock")
    res2 = sess2.run(config=cfg2)
    assert res2.nn_resolution is not None and res2.nn_resolution != 16


def test_cell_capacity_setting_reaches_engine(tmp_path):
    """cell_capacity must reach the hashgrid backend (W2)."""
    sess, _, _, _ = _session_with_pair(tmp_path)
    cfg = ICPConfig(max_iterations=3, nn_backend="hashgrid",
                    grid_resolution=12, cell_capacity=64)
    res = sess.run(config=cfg)
    assert res.success
    assert res.nn_resolution == 12


def test_cli_graph_auto_edges_and_robust(tmp_path, capsys):
    """`icp graph --edges auto --graph-robust tukey`: overlap-detected
    edges + robust solve + device-residency report at the CLI surface."""
    import numpy as np

    from iterativeclosestpoint_tpu.io.las import write_las
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    world = make_cloud(6000, seed=22)
    x = world[:, 0]
    lo, hi = x.min(), x.max()
    ext = hi - lo
    paths = []
    rng = np.random.default_rng(1)
    for s in range(3):
        w_lo = lo + s * 0.25 * ext
        sel = world[(x >= w_lo) & (x <= w_lo + 0.5 * ext)]
        p = tmp_path / f"w{s}.las"
        write_las(p, sel + rng.normal(0, 0.004, sel.shape))
        paths.append(str(p))

    pjson = tmp_path / "poses.json"
    rc = cli_main(["graph", *paths, "--edges", "auto",
                   "--graph-robust", "tukey", "--poses", str(pjson),
                   "--max-iterations", "15"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "overlap-detected edges:" in out
    # reuse_device='auto' now gates on TPU-or-large-edges (ADVICE r3):
    # small CPU scans take the plain per-edge path, so no device
    # residency report here.
    assert "device residency:" not in out
    assert "pose graph:" in out


def test_cli_graph_parallel_partition(tmp_path, capsys):
    """`icp graph --parallel partition`: every edge runs with the target
    spatially partitioned across the 8-device mesh, with the per-target
    partition prep cached across edges (round-3 verdict W6)."""
    import json

    import numpy as np

    from iterativeclosestpoint_tpu.io.las import write_las
    from iterativeclosestpoint_tpu.utils.synth import (
        apply_transform_np,
        make_cloud,
        random_rigid_transform,
    )

    base = make_cloud(3000, seed=23)
    poses = [np.eye(4), random_rigid_transform(seed=41),
             random_rigid_transform(seed=42)]
    paths = []
    for s in range(3):
        p = tmp_path / f"scan{s}.las"
        write_las(p, apply_transform_np(np.linalg.inv(poses[s]), base))
        paths.append(str(p))

    pjson = tmp_path / "poses.json"
    rc = cli_main(["graph", *paths, "--poses", str(pjson), "--loop",
                   "--parallel", "partition", "--max-iterations", "120"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pose graph:" in out
    d = json.loads(pjson.read_text())
    assert len(d["poses"]) == 3
    from iterativeclosestpoint_tpu.io.las import read_las

    for s in range(3):
        scan, _ = read_las(tmp_path / f"scan{s}.las")
        rec = apply_transform_np(np.asarray(d["poses"][s]), scan)
        np.testing.assert_allclose(rec, base, atol=5e-3)


def test_register_scans_partition_caches_target_prep():
    """Two edges sharing a target build ONE partition (the prepared_for
    analog for the partitioned path)."""
    import numpy as np

    from iterativeclosestpoint_tpu.models.posegraph import register_scans
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh
    from iterativeclosestpoint_tpu.utils.synth import (
        apply_transform_np,
        make_cloud,
        random_rigid_transform,
    )

    base = make_cloud(2500, seed=29)
    poses = [np.eye(4), random_rigid_transform(seed=51),
             random_rigid_transform(seed=52)]
    scans = [apply_transform_np(np.linalg.inv(T), base) for T in poses]
    stats = {}
    out = register_scans(
        scans, edges=[(0, 1), (0, 2)], mesh=make_mesh(), partition=True,
        max_iterations=80, tolerance=1e-7, stats=stats,
    )
    assert stats.get("partitions_built") == 1, stats
    assert out.converged
    pts = make_cloud(300, seed=1)
    for s in range(3):
        err = np.abs(apply_transform_np(out.poses[s], pts)
                     - apply_transform_np(poses[s], pts)).max()
        assert err < 5e-3, (s, err)


def test_cli_run_partition_ingest(tmp_path, capsys):
    """`icp run --parallel partition --ingest`: streamed beyond-RAM
    registration at the CLI surface (round-3 verdict W2) — cold start
    from the sampled coarse pass, sampled Pallas grid params, transform
    report + checkpoint + history out."""
    import json

    import numpy as np

    from iterativeclosestpoint_tpu.io.las import write_las
    from iterativeclosestpoint_tpu.utils.synth import make_registration_pair

    src, tgt, T_true = make_registration_pair(n=5001, seed=62,
                                              noise_sigma=0.01)
    sp, tp = tmp_path / "s.las", tmp_path / "t.las"
    write_las(sp, src)
    write_las(tp, tgt)
    report = tmp_path / "report.txt"
    ckpt = tmp_path / "ckpt.json"
    hist = tmp_path / "hist.jsonl"
    rc = cli_main(["run", str(sp), str(tp), "--parallel", "partition",
                   "--ingest", "--report", str(report),
                   "--checkpoint", str(ckpt), "--history", str(hist),
                   "--max-iterations", "40", "--tolerance", "1e-7"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ingest-partitioned:" in out
    assert "coarse sample alignment done" in out
    assert "sampled grid params:" in out
    assert report.exists() and ckpt.exists()
    rec = json.loads(hist.read_text().splitlines()[-1])
    assert rec["success"] and rec["iterations"] >= 1
    # The recovered transform registers the source (reference envelope).
    import jax.numpy as jnp

    from iterativeclosestpoint_tpu.ops.se3 import registration_error

    T = np.asarray(json.loads(ckpt.read_text())["transform"])
    err = float(registration_error(jnp.asarray(T, jnp.float64),
                                   jnp.asarray(T_true, jnp.float64),
                                   jnp.asarray(src, jnp.float64)))
    assert err < 5e-2, err
    # status renders the ingest history record.
    rc = cli_main(["status", "--history", str(hist)])
    assert rc == 0
