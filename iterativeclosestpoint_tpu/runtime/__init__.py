"""Runtime: session orchestration, native bindings, checkpointing, metrics."""

from iterativeclosestpoint_tpu.runtime.native import (
    native_available,
    octree_icp_baseline,
    octree_nn_baseline,
)

__all__ = ["native_available", "octree_icp_baseline", "octree_nn_baseline"]
