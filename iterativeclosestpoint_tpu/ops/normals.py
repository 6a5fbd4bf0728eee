"""Target surface-normal estimation (cell PCA, host-side, build-time).

Support for the point-to-plane estimator (models/icp.py
``estimator="plane"``) — an opt-in extension beyond the reference's
point-to-point Kabsch: on smooth LiDAR surfaces the point-to-point update
crawls along the surface (verified against the reference pipeline:
RMSE plateaus ~0.35 on periodic terrain), while the point-to-plane
linearization converges in a handful of iterations.

Normals are estimated once per registration from the *fixed* target
(octree-built-once semantics, icpengine.cpp:122): points are grouped by
their fine-grid cell (the same cells the NN structures use, occupancy
~100), one 3×3 covariance eigen-decomposition per occupied cell, smallest
eigenvector = normal, shared by the cell's members. Orientation is made
consistent upward (+z hemisphere) — sign is irrelevant to the
point-to-plane residual squared, but consistency helps debugging.
"""

from __future__ import annotations

import numpy as np


def estimate_normals_cellpca(
    target: np.ndarray,
    resolution: int,
    min_points: int = 3,
) -> np.ndarray:
    """(M, 3) unit normals via per-cell PCA on the ``resolution`` grid.

    Cells with fewer than ``min_points`` members fall back to +z.
    """
    target = np.asarray(target, np.float64)
    m = len(target)
    tmin = target.min(axis=0)
    extent = float((target.max(axis=0) - tmin).max()) or 1.0
    cell = extent / resolution

    coords = np.clip((target - tmin) / cell, 0, resolution - 1).astype(np.int64)
    cid = (coords[:, 0] * resolution + coords[:, 1]) * resolution + coords[:, 2]
    order = np.argsort(cid, kind="stable")
    sorted_cid = cid[order]
    starts = np.flatnonzero(np.diff(sorted_cid, prepend=-1))
    counts = np.diff(np.append(starts, m))

    # Per-cell mean and covariance, vectorized with segment sums.
    pts = target[order]
    seg = np.repeat(np.arange(len(starts)), counts)
    sums = np.zeros((len(starts), 3))
    np.add.at(sums, seg, pts)
    means = sums / counts[:, None]
    centered = pts - means[seg]
    outer = centered[:, :, None] * centered[:, None, :]
    covs = np.zeros((len(starts), 3, 3))
    np.add.at(covs, seg, outer)
    covs /= np.maximum(counts, 1)[:, None, None]

    # Smallest-eigenvalue eigenvector per cell.
    w, v = np.linalg.eigh(covs)  # ascending eigenvalues
    cell_normals = v[:, :, 0]
    # Upward orientation; degenerate cells → +z.
    flip = cell_normals[:, 2] < 0
    cell_normals[flip] *= -1
    bad = counts < min_points
    cell_normals[bad] = np.array([0.0, 0.0, 1.0])

    normals = np.empty((m, 3))
    normals[order] = cell_normals[seg]
    return normals
