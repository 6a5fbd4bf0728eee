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

import functools

import jax
import jax.numpy as jnp
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


def _smallest_eigvec_sym3(a11, a12, a13, a22, a23, a33, p_floor):
    """Batched analytic smallest-eigenvalue eigenvector of symmetric 3x3
    matrices (Eberly's trigonometric form) — no LAPACK, TPU-friendly.

    Returns (normals (n,3), degenerate (n,) bool): ``degenerate`` marks
    near-isotropic cells (p below ``p_floor``) where the eigenvector is
    meaningless.
    """
    q = (a11 + a22 + a33) / 3.0
    b11, b22, b33 = a11 - q, a22 - q, a33 - q
    p2 = (b11 * b11 + b22 * b22 + b33 * b33
          + 2.0 * (a12 * a12 + a13 * a13 + a23 * a23))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    degenerate = p <= p_floor
    ps = jnp.where(degenerate, 1.0, p)
    c11, c22, c33 = b11 / ps, b22 / ps, b33 / ps
    c12, c13, c23 = a12 / ps, a13 / ps, a23 / ps
    half_det = (
        c11 * (c22 * c33 - c23 * c23)
        - c12 * (c12 * c33 - c23 * c13)
        + c13 * (c12 * c23 - c22 * c13)
    ) / 2.0
    phi = jnp.arccos(jnp.clip(half_det, -1.0, 1.0)) / 3.0
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest

    # Rows of (A - lam I); eigenvector = the largest cross product of
    # two rows (robust row-pair selection).
    r1 = jnp.stack([a11 - lam, a12, a13], axis=-1)
    r2 = jnp.stack([a12, a22 - lam, a23], axis=-1)
    r3 = jnp.stack([a13, a23, a33 - lam], axis=-1)
    c_a = jnp.cross(r1, r2)
    c_b = jnp.cross(r1, r3)
    c_c = jnp.cross(r2, r3)
    n_a = jnp.sum(c_a * c_a, axis=-1)
    n_b = jnp.sum(c_b * c_b, axis=-1)
    n_c = jnp.sum(c_c * c_c, axis=-1)
    best = jnp.where(
        (n_a >= n_b)[:, None] & (n_a >= n_c)[:, None], c_a,
        jnp.where((n_b >= n_c)[:, None], c_b, c_c),
    )
    norm = jnp.sqrt(jnp.maximum(jnp.sum(best * best, axis=-1), 1e-30))
    return best / norm[:, None], degenerate | (norm <= 1e-12)


@functools.partial(
    jax.jit, static_argnames=("resolution", "min_points", "mask_far")
)
def estimate_normals_cellpca_device(
    target,
    origin,
    cell_size,
    *,
    resolution: int,
    min_points: int = 3,
    mask_far: bool = False,
):
    """On-device twin of ``estimate_normals_cellpca`` (f32-safe).

    Per-cell moments accumulate CELL-LOCAL coordinates (values bounded by
    the cell size) via dense scatter-add — no long prefix sums, so f32
    keeps ~1e-4 relative accuracy regardless of cloud extent or count.
    The per-cell 3x3 PCA is the analytic closed form (no eigh). Normals
    match the host build to ~1e-3 (different reduction order and eigen
    solver); cells under ``min_points`` fall back to +z exactly like the
    host version. Used by the device-built plane-estimator grids at
    scales where a host rebuild + 2x full-grid upload would dominate
    (ops/pallas_nn.make_pallas_nn_device).
    """
    R = resolution
    tgt = target.astype(jnp.float32)
    org = jnp.asarray(origin, jnp.float32)
    cs = jnp.asarray(cell_size, jnp.float32)
    coords = jnp.clip(
        ((tgt - org[None, :]) / cs).astype(jnp.int32), 0, R - 1
    )
    cid = (coords[:, 0] * R + coords[:, 1]) * R + coords[:, 2]
    if mask_far:
        # _FAR-padded slab buffers (parallel/partition.py): pad rows
        # would otherwise clip into the corner cell and poison its
        # moments for REAL points there; route them to an overflow
        # bucket instead (their own normals are never consumed — _FAR
        # rows never win a 1-NN).
        cid = jnp.where(tgt[:, 0] >= 0.5e6, R ** 3, cid)
    local = tgt - (coords.astype(jnp.float32) * cs + org[None, :])

    lx, ly, lz = local[:, 0], local[:, 1], local[:, 2]
    mom = jnp.stack(
        [jnp.ones_like(lx), lx, ly, lz,
         lx * lx, lx * ly, lx * lz, ly * ly, ly * lz, lz * lz],
        axis=1,
    )  # (m, 10)
    cellmom = jnp.zeros((R ** 3 + 1, 10), jnp.float32).at[cid].add(mom)
    pm = cellmom[cid]  # (m, 10) — own cell's moments
    cnt = pm[:, 0]
    inv = 1.0 / jnp.maximum(cnt, 1.0)
    mx, my, mz = pm[:, 1] * inv, pm[:, 2] * inv, pm[:, 3] * inv
    a11 = pm[:, 4] * inv - mx * mx
    a12 = pm[:, 5] * inv - mx * my
    a13 = pm[:, 6] * inv - mx * mz
    a22 = pm[:, 7] * inv - my * my
    a23 = pm[:, 8] * inv - my * mz
    a33 = pm[:, 9] * inv - mz * mz
    nrm, degen = _smallest_eigvec_sym3(
        a11, a12, a13, a22, a23, a33, p_floor=1e-12
    )
    nrm = jnp.where(nrm[:, 2:3] < 0, -nrm, nrm)  # upward orientation
    bad = (cnt < min_points) | degen
    up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    return jnp.where(bad[:, None], up[None, :], nrm)
