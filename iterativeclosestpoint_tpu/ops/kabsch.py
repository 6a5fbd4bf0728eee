"""Kabsch/SVD rigid-transform estimation (masked, fixed-shape, jit-safe).

TPU-native equivalent of the reference's ``computeBestFitTransform``
(``PointCloudRegistration/core/icpengine.cpp:76-115``): centroids →
centered clouds → cross-covariance H = Σ a_c b_cᵀ → SVD → R = V Uᵀ with the
det<0 reflection fix applied to the last column of V (the GUI-form fix,
icpengine.cpp:101-104) → t = c_b − R c_a.

Where the reference gathers the inlier subset into a compacted (3, N_valid)
matrix (icpengine.cpp:325-337), we keep fixed shapes and fold the inlier
mask into the reductions as 0/1 weights — the centroids and covariance are
mathematically identical to the compacted computation. All reductions are
single fused passes on device; the SVD itself is a free 3x3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU f32 matmuls default to bf16 MXU passes; the covariance/centroid
# reductions need full f32 accumulation for the 1e-4 parity gate.
_HI = jax.lax.Precision.HIGHEST


def _weighted_moments(src, dst, w, accum_dtype):
    """Weighted centroids + cross-covariance in one pass of reductions.

    Returns (centroid_src (3,), centroid_dst (3,), H (3,3), count ()).
    """
    w = w.astype(accum_dtype)
    s = src.astype(accum_dtype)
    d = dst.astype(accum_dtype)

    count = jnp.sum(w)
    inv = jnp.where(count > 0, 1.0 / count, 0.0).astype(accum_dtype)
    c_s = jnp.dot(w, s, precision=_HI) * inv  # (3,)
    c_d = jnp.dot(w, d, precision=_HI) * inv

    sc = (s - c_s) * w[:, None]
    dc = d - c_d
    # H = Σ_i w_i (s_i - c_s)(d_i - c_d)ᵀ — a (3,N)x(N,3) matmul on the MXU.
    H = jnp.dot(sc.T, dc, precision=_HI)
    return c_s, c_d, H, count


def rigid_from_covariance(H: jnp.ndarray, c_src: jnp.ndarray, c_dst: jnp.ndarray):
    """Solve the orthogonal Procrustes problem given cross-covariance H.

    Reflection handling follows the reference GUI form: flip V's last
    column when det(V Uᵀ) < 0 (icpengine.cpp:101-104). Note the reference
    flips unconditionally on the *third* column rather than the column of
    the smallest singular value — with JacobiSVD (sorted singular values)
    these coincide, as they do for ``jnp.linalg.svd``.
    """
    U, _, Vt = jnp.linalg.svd(H)
    V = Vt.T
    R = V @ U.T
    det = jnp.linalg.det(R)
    V_fixed = V.at[:, 2].multiply(jnp.where(det < 0, -1.0, 1.0))
    R = V_fixed @ U.T
    t = c_dst - R @ c_src

    T = jnp.eye(4, dtype=H.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def kabsch_masked(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    mask: jnp.ndarray,
    accum_dtype=None,
) -> jnp.ndarray:
    """Best rigid transform mapping masked ``src`` points onto ``dst``.

    Args:
      src: (N, 3) source points.
      dst: (N, 3) matched destination points (same index = correspondence).
      mask: (N,) boolean/0-1 inlier mask (the 3-sigma valid set).
      accum_dtype: dtype for the centroid/covariance reductions; defaults to
        the input dtype (f32 on TPU — coordinates are pre-centered by the
        f64 global offset held on host, see io.las; f64 in CPU parity
        tests).

    Returns:
      (4, 4) homogeneous transform, cast back to ``src.dtype``.
    """
    if accum_dtype is None:
        accum_dtype = src.dtype
    c_s, c_d, H, _ = _weighted_moments(src, dst, mask, accum_dtype)
    return rigid_from_covariance(H, c_s, c_d).astype(src.dtype)


def kabsch(src: jnp.ndarray, dst: jnp.ndarray, accum_dtype=None):
    """Unmasked Kabsch over full correspondence sets."""
    ones = jnp.ones(src.shape[:1], dtype=src.dtype)
    return kabsch_masked(src, dst, ones, accum_dtype)
