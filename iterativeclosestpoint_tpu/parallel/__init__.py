"""Mesh/sharding layer: multi-chip data-parallel ICP over ICI collectives."""

from iterativeclosestpoint_tpu.parallel.mesh import make_mesh
from iterativeclosestpoint_tpu.parallel.posegraph import (
    optimize_pose_graph_sharded,
)
from iterativeclosestpoint_tpu.parallel.sharded import icp_register_sharded

__all__ = ["make_mesh", "icp_register_sharded", "optimize_pose_graph_sharded"]
