"""Mesh/sharding layer: multi-chip data-parallel ICP over ICI collectives."""

from iterativeclosestpoint_tpu.parallel.ingest import (
    coarse_carry_from_files,
    estimate_partition_grid_params,
    load_las_partitioned_source,
    load_las_partitioned_target,
    load_las_sharded,
    sample_points,
    sample_x_walls,
)
from iterativeclosestpoint_tpu.parallel.mesh import make_mesh
from iterativeclosestpoint_tpu.parallel.partition import (
    icp_register_partitioned,
    prepare_partition,
)
from iterativeclosestpoint_tpu.parallel.posegraph import (
    optimize_pose_graph_sharded,
)
from iterativeclosestpoint_tpu.parallel.sharded import icp_register_sharded

__all__ = [
    "make_mesh",
    "icp_register_sharded",
    "icp_register_partitioned",
    "optimize_pose_graph_sharded",
    "load_las_sharded",
    "load_las_partitioned_target",
    "load_las_partitioned_source",
    "sample_x_walls",
    "sample_points",
    "estimate_partition_grid_params",
    "coarse_carry_from_files",
    "prepare_partition",
]
