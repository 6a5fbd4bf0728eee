"""Distributed pose-graph GN on the 8-device virtual mesh."""

import numpy as np

from iterativeclosestpoint_tpu.models.posegraph import optimize_pose_graph
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh
from iterativeclosestpoint_tpu.parallel.posegraph import (
    optimize_pose_graph_sharded,
)
from iterativeclosestpoint_tpu.utils.synth import random_rigid_transform
from iterativeclosestpoint_tpu.ops.se3 import se3_exp
import jax.numpy as jnp


def _chain_with_loop(k, seed, noise=0.0):
    rng = np.random.default_rng(seed)
    poses = [np.eye(4)] + [random_rigid_transform(seed=seed + s) for s in range(1, k)]
    edges = []
    for i in range(k - 1):
        Z = np.linalg.inv(poses[i]) @ poses[i + 1]
        if noise:
            Z = Z @ np.asarray(se3_exp(jnp.asarray(rng.normal(0, noise, 6))))
        edges.append((i, i + 1, Z))
    edges.append((0, k - 1, np.linalg.inv(poses[0]) @ poses[k - 1]))
    return poses, edges


def test_sharded_matches_host_exact():
    poses, edges = _chain_with_loop(6, 40)
    mesh = make_mesh(n_devices=8)
    out_s = optimize_pose_graph_sharded(edges, n_poses=6, mesh=mesh)
    for s in range(6):
        np.testing.assert_allclose(out_s.poses[s], poses[s], atol=1e-8)


def test_sharded_matches_host_noisy():
    _, edges = _chain_with_loop(7, 41, noise=0.01)
    mesh = make_mesh(n_devices=4)
    out_h = optimize_pose_graph(edges, n_poses=7, max_iterations=15)
    out_s = optimize_pose_graph_sharded(
        edges, n_poses=7, mesh=mesh, max_iterations=15
    )
    np.testing.assert_allclose(out_s.poses, out_h.poses, atol=1e-7)


def test_edge_count_not_multiple_of_devices():
    # 4 edges over 8 devices: padding edges must contribute nothing.
    poses, edges = _chain_with_loop(4, 42)
    mesh = make_mesh(n_devices=8)
    out = optimize_pose_graph_sharded(edges, n_poses=4, mesh=mesh)
    for s in range(4):
        np.testing.assert_allclose(out.poses[s], poses[s], atol=1e-8)
