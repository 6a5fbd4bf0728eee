"""Registration pipelines: pairwise ICP, multiscale ICP, pose-graph."""

from iterativeclosestpoint_tpu.models.icp import ICPResult, icp_register

__all__ = ["ICPResult", "icp_register"]
