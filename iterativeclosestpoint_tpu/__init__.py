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

import os as _os

# Some virtualized hosts fault transparent huge pages at ~8 MB/s (each 2 MB
# THP fault stalls ~250 ms in the hypervisor), which turns numpy's default
# MADV_HUGEPAGE on large buffers into a 200x slowdown on every cold
# allocation (measured: 19 s vs 0.04 s to first-touch an 80 MB array).
# Host-side prep (grid builds, LAS decode) is allocation-heavy, so force
# normal 4 KB faulting. Env var covers a not-yet-imported numpy; the private
# runtime toggle covers the already-imported case.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:
    from numpy._core.multiarray import _set_madvise_hugepage

    _set_madvise_hugepage(False)
except Exception:  # pragma: no cover - numpy<2 or internal rename
    pass

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
