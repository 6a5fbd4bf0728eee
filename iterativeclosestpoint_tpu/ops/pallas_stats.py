"""Fused 3-sigma rejection + moment accumulation Pallas kernel (hot loop B).

Fuses the reference's per-iteration inlier pass — valid filter
(icpengine.cpp:263-268), RMSE numerator (:273-278), and the
centroid/cross-covariance reductions inside computeBestFitTransform
(icpengine.cpp:82-90) — into ONE streaming pass over the correspondence
arrays: each grid program loads a tile of (source, matched, distance,
weight) into VMEM, forms the 0/1 inlier mask against the scalar
threshold, and accumulates

    cnt       = Σ v              sum_d2 = Σ v·d²
    sum_s (3) = Σ v·s            sum_t (3) = Σ v·t
    M (3,3)   = Σ v·s·tᵀ         (raw cross moment)

into a single shared output block (sequential grid ⇒ race-free
accumulation). The rigid transform follows from the raw moments:
H = M − sum_s·sum_tᵀ/cnt, centroids = sums/cnt — algebraically identical
to the two-pass form used by models/icp (which remains the default for
maximum f32 parity); this kernel is the fused alternative and the unit
measured for covariance-kernel speed-of-light reporting.

Layouts are coordinate-transposed (t, 8, TILE) like ops/pallas_nn: rows
0-2 carry x,y,z; the source block's row 3 carries the distance and row 4
the row-validity weight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(tile: int):
    def kernel(thr_ref, src_ref, dst_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        s = src_ref[0]  # (8, tile): rows 0-2 xyz, 3 dist, 4 weight
        t = dst_ref[0]  # (8, tile): rows 0-2 xyz
        d = s[3, :]
        v = jnp.where(d <= thr_ref[0], s[4, :], 0.0)  # (tile,)
        dm = jnp.where(v > 0, d, 0.0)  # padding rows carry inf — mask first

        cnt = jnp.sum(v)
        sum_d2 = jnp.sum(v * dm * dm)
        sv = s[0:8, :] * v[None, :]
        sum_s = jnp.sum(sv[0:3, :], axis=1, keepdims=True)  # (3, 1)
        sum_t = jnp.sum(t[0:3, :] * v[None, :], axis=1, keepdims=True)
        # M = Σ v·s·tᵀ — one (3,tile)x(tile,3) contraction on the MXU.
        M = jax.lax.dot_general(
            sv[0:3, :], t[0:3, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3, 3)

        # Scatter-free accumulation: element-indexed .at[].add lowers to
        # scatter-add, which Pallas TPU cannot lower. Build the (8, 128)
        # update block with iota masks / pads (all 2-D) and add whole.
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        upd = jnp.where((row == 0) & (col == 0), cnt, 0.0)
        upd = jnp.where((row == 0) & (col == 1), sum_d2, upd)
        upd = jnp.where(row == 1, jnp.pad(sum_s.T, ((0, 0), (0, 125))), upd)
        upd = jnp.where(row == 2, jnp.pad(sum_t.T, ((0, 0), (0, 125))), upd)
        upd = upd + jnp.pad(M, ((3, 2), (0, 125)))  # rows 3-5
        out_ref[:, :] = out_ref[:, :] + upd

    return kernel


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_inlier_moments(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    dist: jnp.ndarray,
    weight: jnp.ndarray,
    threshold,
    *,
    tile: int = 2048,
):
    """One fused pass → (cnt, sum_d2, sum_s (3,), sum_t (3,), M (3,3)).

    src/dst: (N, 3) f32; dist/weight: (N,); threshold: scalar.
    """
    n = src.shape[0]
    n_pad = -(-n // tile) * tile
    t = n_pad // tile

    def pack(pts, extra1=None, extra2=None):
        buf = jnp.zeros((t, 8, tile), jnp.float32)
        p = jnp.pad(pts.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
        buf = buf.at[:, 0:3, :].set(p.reshape(t, tile, 3).transpose(0, 2, 1))
        if extra1 is not None:
            e = jnp.pad(extra1.astype(jnp.float32), (0, n_pad - n),
                        constant_values=jnp.inf)
            buf = buf.at[:, 3, :].set(e.reshape(t, tile))
        if extra2 is not None:
            e = jnp.pad(extra2.astype(jnp.float32), (0, n_pad - n))
            buf = buf.at[:, 4, :].set(e.reshape(t, tile))
        return buf

    src_b = pack(src, dist, weight)  # padding rows: dist=inf, weight=0
    dst_b = pack(dst)

    out = pl.pallas_call(
        _stats_kernel(tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, 8, tile), lambda i, *r: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, tile), lambda i, *r: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, *r: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=(jax.default_backend() != "tpu"),
    )(jnp.asarray([threshold], jnp.float32), src_b, dst_b)

    cnt = out[0, 0]
    sum_d2 = out[0, 1]
    sum_s = out[1, 0:3]
    sum_t = out[2, 0:3]
    M = out[3:6, 0:3]
    return cnt, sum_d2, sum_s, sum_t, M


def rigid_from_fused_moments(cnt, sum_s, sum_t, M, dtype=jnp.float32):
    """Solve the masked Kabsch problem from the raw fused moments."""
    from iterativeclosestpoint_tpu.ops.kabsch import rigid_from_covariance

    inv = jnp.where(cnt > 0, 1.0 / cnt, 0.0)
    c_s = sum_s * inv
    c_t = sum_t * inv
    H = M - jnp.outer(sum_s, sum_t) * inv
    return rigid_from_covariance(
        H.astype(dtype), c_s.astype(dtype), c_t.astype(dtype)
    )
