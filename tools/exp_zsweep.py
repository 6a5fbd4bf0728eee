"""TPU experiment (round 4, VERDICT W1): why is the z-column kernel at
50% SoL, and does a coalesced z-windowed slab sweep fix it?

Hypotheses measured here:
  H1: per-chunk/DMA overhead — zcol runs 12 short (8, zrange) chunks per
      tile where the sweep runs 4 long ones; same candidate count, 1.8x
      the wall time.
  H2: the (x,y)-group query layout statically pads R²·(tile_q-1) rows
      (~520k at R=64, 1M queries) — 1.5x the tile count, all executed.
  H3: dead slots (nx·ny < 12) still DMA+sweep full zrange rows.

Prototype "zsweep": slab s covers x = minx-1+s as the x-sweep does, but
the slab's row range is [cell_start[(x,miny-1,zmin-1)],
cell_start[(x,maxy+1,zmax+1)+1]) through the full R³ CSR — ONE contiguous
DMA per x covering the tile's dilated y×z window (plus harmless gap rows,
which are real target points — the superset argument). 4 long DMAs,
x-group layout (G=R padding), z-window candidate counts.
"""

import os
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np  # noqa: E402

import iterativeclosestpoint_tpu  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import functools  # noqa: E402

from iterativeclosestpoint_tpu.ops import pallas_nn as pn  # noqa: E402
from iterativeclosestpoint_tpu.ops.cellblock import (  # noqa: E402
    auto_resolution_data,
)
from iterativeclosestpoint_tpu.utils.hostmath import bbox  # noqa: E402
from iterativeclosestpoint_tpu.utils.synth import (  # noqa: E402
    apply_transform_np,
    make_registration_pair,
)

N = int(os.environ.get("EXP_N", 1_000_000))


def _sync(out):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[-1])[:1])


def timeit(fn, reps=20):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / reps, out


@functools.partial(
    jax.jit, static_argnames=("resolution", "tile_q", "slabs", "budget")
)
def nn_zsweep(query, grid, *, resolution, tile_q=128, slabs=4, budget=1024):
    """Z-windowed slab sweep prototype (see module docstring)."""
    R = resolution
    n_in = query.shape[0]
    n = -(-n_in // tile_q) * tile_q
    if n != n_in:
        query = jnp.concatenate(
            [query, jnp.broadcast_to(query[-1], (n - n_in, 3))], axis=0
        )
    t = n // tile_q
    m_rows = grid.tgt_t.shape[1]

    q32 = query.astype(jnp.float32)
    cs = jnp.broadcast_to(grid.cell_size.astype(jnp.float32), (3,))
    org = grid.origin.astype(jnp.float32)
    qc_f = (q32 - org) / cs
    occ_hi = jnp.minimum(
        jnp.floor(
            (grid.bbox_hi.astype(jnp.float32) - org) / cs
        ).astype(jnp.int32),
        R - 1,
    )
    qcell = jnp.clip(jnp.floor(qc_f).astype(jnp.int32), 0, occ_hi[None, :])

    qc_t = qcell.reshape(t, tile_q, 3)
    minc = jnp.min(qc_t, axis=1)  # (t, 3)
    maxc = jnp.max(qc_t, axis=1)

    # Slab s covers x = minx-1+s; its row range spans columns
    # [miny-1 .. maxy+1], restricted at the ends to the z window
    # [zmin-1 .. zmax+1] (contiguous in the R³ CSR ordering).
    s_ix = jnp.arange(slabs, dtype=jnp.int32)
    xs = minc[:, 0:1] - 1 + s_ix[None, :]          # (t, slabs)
    x_ok = (xs >= 0) & (xs < R) & (xs <= maxc[:, 0:1] + 1)
    xs_cl = jnp.clip(xs, 0, R - 1)
    y_lo = jnp.clip(minc[:, 1] - 1, 0, R - 1)[:, None]
    y_hi = jnp.clip(maxc[:, 1] + 1, 0, R - 1)[:, None]
    z_lo = jnp.clip(minc[:, 2] - 1, 0, R - 1)[:, None]
    z_hi = jnp.clip(maxc[:, 2] + 1, 0, R - 1)[:, None]
    start = grid.cell_start[(xs_cl * R + y_lo) * R + z_lo]
    end = grid.cell_start[(xs_cl * R + y_hi) * R + z_hi + 1]
    start = jnp.where(x_ok, start, 0)
    end = jnp.where(x_ok, end, 0)
    slab_fit = (end - start) <= budget - 128

    # Per-query certification: own x±1 slabs present & within budget.
    sx = qc_t[..., 0] - (minc[:, 0:1] - 1)
    in_box = sx + 1 <= slabs - 1
    fit3_tab = slab_fit
    fit3_tab = fit3_tab & jnp.concatenate(
        [slab_fit[:, :1], slab_fit[:, :-1]], axis=1
    )
    fit3_tab = fit3_tab & jnp.concatenate(
        [slab_fit[:, 1:], slab_fit[:, -1:]], axis=1
    )
    s_iota = jnp.arange(slabs, dtype=sx.dtype)
    fit3 = jnp.any(
        (sx[..., None] == s_iota) & fit3_tab[:, None, :], axis=-1
    )
    query_complete = (in_box & fit3).reshape(n)

    # Certificate radius: covered window is x: own ±1 cells, y:
    # [miny-1, maxy+1], z: [zmin-1, zmax+1]; edges at/beyond the grid or
    # the target's true extent certify to infinity; out-of-bbox gap
    # strengthening as in nn_colsweep/nn_colsweep_z.
    pq = (q32 - org[None, :]).reshape(t, tile_q, 3)
    inf = jnp.asarray(jnp.inf, jnp.float32)
    hi_rel = grid.bbox_hi.astype(jnp.float32) - org
    qx_c = qc_t[..., 0]
    rx_lo = jnp.where(qx_c <= 1, inf, pq[..., 0] - (qx_c - 1) * cs[0])
    rx_hi = jnp.where(
        (qx_c >= R - 2) | ((qx_c + 2) * cs[0] > hi_rel[0]),
        inf, (qx_c + 2) * cs[0] - pq[..., 0],
    )
    rs = [jnp.minimum(rx_lo, rx_hi)]
    for a, (lo_c, hi_c) in ((1, (minc[:, 1:2], maxc[:, 1:2])),
                            (2, (minc[:, 2:3], maxc[:, 2:3]))):
        r_lo = jnp.where(lo_c <= 1, inf, pq[..., a] - (lo_c - 1) * cs[a])
        r_hi = jnp.where(
            (hi_c >= R - 2) | ((hi_c + 2) * cs[a] > hi_rel[a]),
            inf, (hi_c + 2) * cs[a] - pq[..., a],
        )
        rs.append(jnp.minimum(r_lo, r_hi))
    gaps = [
        jnp.maximum(
            jnp.maximum(-pq[..., a], pq[..., a] - hi_rel[a]), 0.0
        )
        for a in range(3)
    ]
    g2 = [g * g for g in gaps]
    esc = [
        jnp.sqrt(rs[a] * rs[a] + sum(g2[b] for b in range(3) if b != a))
        for a in range(3)
    ]
    radius = jnp.minimum(jnp.minimum(esc[0], esc[1]), esc[2]).reshape(n)

    base = jnp.minimum(start, m_rows - budget).astype(jnp.int32)
    base = (base // 128) * 128

    out = pn._sweep_kernel_call(
        base, q32, grid.tgt_t, slabs=slabs, trange=budget,
        tile_q=tile_q, first_tie=False,
    )
    d2 = out[:, 6, :].reshape(n)
    unique = out[:, 7, :].reshape(n) == 1.0
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    matched = out[:, 0:3, :].transpose(0, 2, 1).reshape(n, 3)
    certified = query_complete & (dist <= radius) & unique
    return matched[:n_in], dist[:n_in], certified[:n_in]


def main():
    print("devices:", jax.devices(), flush=True)
    src, tgt, T_true = make_registration_pair(
        n=N, seed=7, noise_sigma=0.02, kind="uniform", extent=100.0
    )
    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    tgt_dev = jax.device_put(tgtl)
    # Steady state: source at the true pose (residual = noise only).
    q_np = (apply_transform_np(T_true, src) - offset).astype(np.float32)

    R = auto_resolution_data(tgtl)
    zr = pn.auto_zrange(tgtl, R)
    tr = pn.auto_trange(tgtl, R)
    print(f"N={N} R={R} auto_zrange={zr} auto_trange={tr}", flush=True)

    # ---- host stats -------------------------------------------------
    lo3, hi3 = bbox(tgtl)
    cell3 = np.maximum((hi3 - lo3) / R, 1e-9)
    c = np.clip(((tgtl - lo3) / cell3).astype(np.int64), 0, R - 1)
    colcnt = np.bincount(c[:, 0] * R + c[:, 1], minlength=R * R)
    col2 = colcnt.reshape(R, R)
    csum = np.concatenate(
        [np.zeros((R, 1), np.int64), np.cumsum(col2, axis=1)], axis=1
    )
    w3 = csum[:, 3:] - csum[:, :-3]  # 3-consecutive-y column sums per x
    mass = w3.astype(np.float64).ravel()
    order = np.argsort(w3.ravel())
    cdf = np.cumsum(mass[order]) / max(mass.sum(), 1)
    p999_3col = int(w3.ravel()[order][np.searchsorted(cdf, 0.999)])
    print(f"col rows: p50={np.median(colcnt[colcnt>0]):.0f} "
          f"max={colcnt.max()}; 3-col sums p99.9(mass)={p999_3col} "
          f"max={w3.max()}", flush=True)
    occ_groups = int((colcnt > 0).sum())
    print(f"occupied (x,y) groups: {occ_groups} of {R*R}; "
          f"xy-layout static rows = {N + R*R*127:,} "
          f"({(N + R*R*127)/N:.2f}x); x-layout static rows = "
          f"{N + R*127:,} ({(N + R*127)/N:.3f}x)", flush=True)

    # ---- grids ------------------------------------------------------
    zgrid = pn._build_zgrid_dev(
        tgt_dev, jnp.asarray(lo3, jnp.float32),
        jnp.asarray(cell3.astype(np.float32)), resolution=R, zrange=zr,
    )
    ext = float((hi3 - lo3).max())
    sgrid = pn._build_grid_dev(
        tgt_dev, jnp.asarray(lo3, jnp.float32),
        jnp.asarray(max(ext / R, 1e-9), jnp.float32),
        resolution=R, trange=tr,
    )

    q_dev = jnp.asarray(q_np)
    rows_xy, w_xy = pn.grouped_tile_order_device(
        q_dev, zgrid.origin, zgrid.cell_size, resolution=R, group="xy"
    )
    q_xy = q_dev[rows_xy]
    rows_x, w_x = pn.grouped_tile_order_device(
        q_dev, zgrid.origin, zgrid.cell_size, resolution=R, group="x"
    )
    q_x = q_dev[rows_x]
    # Sweep kernel layout is built against the CUBIC-cell grid.
    rows_s, w_s = pn.grouped_tile_order_device(
        q_dev, sgrid.origin, sgrid.cell_size, resolution=R, group="x"
    )
    q_s = q_dev[rows_s]
    print(f"layout rows: xy={q_xy.shape[0]:,} x={q_x.shape[0]:,} "
          f"(real {N:,})", flush=True)

    # Slot-occupancy stats for zcol (host, from the xy layout).
    qc = np.clip(((np.asarray(q_xy) - lo3) / cell3).astype(np.int64),
                 0, R - 1)
    tq = qc.reshape(-1, 128, 3)
    mn = tq.min(axis=1)
    mx = tq.max(axis=1)
    nx = np.clip(mx[:, 0] + 1, 0, R - 1) - np.clip(mn[:, 0] - 1, 0, R - 1) + 1
    ny = np.clip(mx[:, 1] + 1, 0, R - 1) - np.clip(mn[:, 1] - 1, 0, R - 1) + 1
    occ12 = nx * ny
    print(f"zcol slots used: mean={occ12.mean():.1f}/12 "
          f"p50={np.median(occ12):.0f} frac>12={np.mean(occ12 > 12):.4f}",
          flush=True)

    # ---- timings ----------------------------------------------------
    dt, out_zcol = timeit(lambda: pn.nn_colsweep_z(
        q_xy, zgrid, resolution=R, zrange=zr))
    cert = float(jnp.sum(out_zcol[3] * w_xy) / jnp.sum(w_xy))
    print(f"[zcol xy_slots=12 zr={zr}] {dt*1e3:.2f} ms "
          f"cert={cert*100:.2f}% rows={q_xy.shape[0]:,}", flush=True)

    dt9, _ = timeit(lambda: pn.nn_colsweep_z(
        q_xy, zgrid, resolution=R, zrange=zr, xy_slots=9))
    print(f"[zcol xy_slots=9] {dt9*1e3:.2f} ms (slot scaling)", flush=True)

    dts, out_s = timeit(lambda: pn.nn_colsweep(
        q_s, sgrid, resolution=R, slabs=4, trange=tr))
    certs = float(jnp.sum(out_s[3] * w_s) / jnp.sum(w_s))
    print(f"[sweep slabs=4 tr={tr}] {dts*1e3:.2f} ms cert={certs*100:.2f}% "
          f"rows={q_s.shape[0]:,}", flush=True)

    budget = 128 * -(-int(p999_3col * 4 / 3) // 128)
    for b in (768, 1024, 1536, 2048):
        if budget <= b:
            budget = b
            break
    dtz, out_z = timeit(lambda: nn_zsweep(
        q_x, zgrid, resolution=R, slabs=4, budget=budget))
    certz = float(jnp.sum(out_z[2] * w_x) / jnp.sum(w_x))
    print(f"[zsweep slabs=4 budget={budget}] {dtz*1e3:.2f} ms "
          f"cert={certz*100:.2f}% rows={q_x.shape[0]:,}", flush=True)

    # Exactness spot check: certified zsweep results vs brute force on a
    # 20k subsample.
    from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce

    sel = np.random.default_rng(0).choice(q_x.shape[0], 20_000,
                                          replace=False)
    sel = jnp.asarray(np.sort(sel))
    qs = q_x[sel]
    bi, bd = nn_bruteforce(qs, tgt_dev)
    mz = out_z[0][sel]
    dz = out_z[1][sel]
    cz = out_z[2][sel]
    ok = jnp.where(cz, jnp.abs(dz - bd) < 1e-5, True)
    mok = jnp.where(cz[:, None], jnp.abs(mz - tgt_dev[bi]) < 1e-4, True)
    print(f"zsweep exactness on certified subsample: dist ok "
          f"{float(jnp.mean(ok.astype(jnp.float32)))*100:.3f}%, matched ok "
          f"{float(jnp.mean(mok.astype(jnp.float32)))*100:.3f}% "
          f"(cert frac in sample {float(jnp.mean(cz.astype(jnp.float32)))*100:.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
