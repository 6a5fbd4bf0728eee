"""Fast host-side reductions over (N,3) clouds.

numpy's ``arr.min(axis=0)`` on a C-contiguous (N,3) array takes a
scalar pairwise inner loop — measured 57 ms at 1M f32 rows on this
class of host, ~100x off memory bandwidth. Per-column strided scans
vectorize properly (5.8 ms). Converted callers: the grid/estimator
builds (ops/cellblock.py, ops/pallas_nn.py), the centering-offset
computation (models/icp.py, models/multiscale.py, parallel/sharded.py,
parallel/partition.py via ``center_offset``) and the LAS writer's
header bounds (io/las.py).

The min/max *values* are bit-identical to the axis-0 form (same floats,
same reduction, different loop order) — but ``bbox`` returns f64
vectors, so downstream expressions like ``(target - tmin) / cell`` on
f32 clouds promote to f64 where the axis-0 form stayed f32. That can
shift a point sitting exactly on a cell boundary by one cell versus the
old builds (harmless: it matches grouped_tile_order's f64 query binning,
and the oracle-parity tests pin the trajectories) — noted because grid
builds are therefore not bit-for-bit reproducible against pre-bbox
builds.
"""

from __future__ import annotations

import numpy as np


def bbox(pts: np.ndarray):
    """(min, max) over axis 0 of an (N,3) array via per-column scans.

    Returns float64 3-vectors (the offset/geometry math downstream is
    f64 by contract).
    """
    pts = np.asarray(pts)
    lo = np.empty(pts.shape[1], np.float64)
    hi = np.empty(pts.shape[1], np.float64)
    for i in range(pts.shape[1]):
        col = pts[:, i]
        lo[i] = col.min()
        hi[i] = col.max()
    return lo, hi


def center_offset(target: np.ndarray) -> np.ndarray:
    """The f64 global centering offset: combined-bbox center of the
    target (the frame every device-side f32 computation is relative to)."""
    lo, hi = bbox(target)
    return (lo + hi) / 2.0
