"""Device compute ops: geometry, rigid fit, nearest-neighbor search, kernels."""

from iterativeclosestpoint_tpu.ops.se3 import (
    apply_transform,
    compose,
    identity_transform,
    rotation_angle_deg,
    se3_from_euler,
    translation_norm,
)
from iterativeclosestpoint_tpu.ops.kabsch import kabsch_masked, kabsch
from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce

__all__ = [
    "apply_transform",
    "compose",
    "identity_transform",
    "rotation_angle_deg",
    "se3_from_euler",
    "translation_norm",
    "kabsch",
    "kabsch_masked",
    "nn_bruteforce",
]
