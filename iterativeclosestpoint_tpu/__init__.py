"""iterativeclosestpoint_tpu — a TPU-native point-cloud registration engine.

A ground-up re-design of the capabilities of the reference project
B1AnKAlpha/IterativeClosestPoint (a C++17/Qt/Eigen octree-ICP tool for LAS
LiDAR scans) as an idiomatic JAX/XLA/Pallas framework:

- ``io``       — LAS 1.2 ingest/egress (numpy-vectorized + native C++ path).
- ``ops``      — device compute: SE(3) geometry, Kabsch/SVD rigid fit,
                 brute-force and voxel-hash nearest-neighbor search,
                 Pallas TPU kernels for the NN + covariance hot loops.
- ``models``   — registration pipelines: pairwise ICP (masked
                 ``lax.while_loop`` driver), coarse-to-fine multiscale ICP,
                 multi-scan pose-graph optimization.
- ``parallel`` — mesh/sharding layer: source points sharded over chips,
                 per-iteration statistics reduced with ``psum``.
- ``runtime``  — session orchestration, checkpoint/resume, metrics.
- ``utils``    — config, synthetic fixtures, NumPy oracle of the reference.

Reference layer map: SURVEY.md §1; component inventory: SURVEY.md §2.
"""

from iterativeclosestpoint_tpu.utils.config import AppSettings, ICPConfig
from iterativeclosestpoint_tpu.models.icp import ICPResult, icp_register
from iterativeclosestpoint_tpu.models.multiscale import icp_register_multiscale
from iterativeclosestpoint_tpu.models.posegraph import (
    optimize_pose_graph,
    register_scans,
)

__version__ = "0.1.0"

__all__ = [
    "AppSettings",
    "ICPConfig",
    "ICPResult",
    "icp_register",
    "icp_register_multiscale",
    "optimize_pose_graph",
    "register_scans",
    "__version__",
]
