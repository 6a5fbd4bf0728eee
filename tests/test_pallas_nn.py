"""Pallas slab-sweep NN kernel: correctness in interpreter mode (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from iterativeclosestpoint_tpu.models.icp import icp_register
from iterativeclosestpoint_tpu.ops.cellblock import (
    auto_resolution_data,
    morton_order,
)
from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
from iterativeclosestpoint_tpu.ops.pallas_nn import (
    build_pallas_grid,
    nn_colsweep,
    nn_colsweep_exact,
)
from iterativeclosestpoint_tpu.utils.synth import make_cloud, make_registration_pair


@pytest.mark.parametrize("kind", ["terrain", "sphere"])
def test_certified_exact(kind):
    tgt = make_cloud(15000, seed=80, kind=kind)
    rng = np.random.default_rng(0)
    q = tgt + rng.normal(0, 0.03, tgt.shape)
    R = auto_resolution_data(tgt)
    q = q[morton_order(q, R)]
    grid = build_pallas_grid(tgt, R)

    m, _nrm, d, cert = nn_colsweep(jnp.asarray(q, jnp.float32), grid, resolution=R)
    d_ref, i_ref = cKDTree(tgt).query(q)
    cert = np.asarray(cert)
    assert cert.mean() > 0.85, f"cert rate {cert.mean()}"
    np.testing.assert_allclose(np.asarray(d)[cert], d_ref[cert], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(m)[cert], tgt[i_ref][cert], atol=1e-3
    )


def test_exact_variant_with_outliers():
    tgt = make_cloud(5000, seed=81)
    rng = np.random.default_rng(1)
    q = np.vstack(
        [
            tgt + rng.normal(0, 0.02, tgt.shape),
            rng.uniform(-150, 150, (300, 3)),
        ]
    )
    R = auto_resolution_data(tgt)
    q = q[morton_order(q, R)]
    grid = build_pallas_grid(tgt, R)
    m, _nrm, d = nn_colsweep_exact(
        jnp.asarray(q, jnp.float32), jnp.asarray(tgt, jnp.float32), grid,
        resolution=R, brute_batch=512, brute_passes=4,
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m), tgt[i_ref], atol=1e-3)


def test_coarse_repair_plus_budgeted_brute_exact():
    """Queries ~1 fine cell off: half fail fine certification; the
    4x-coarser level certifies most of those, and a modest tile-budgeted
    brute stage mops up the rest — full exactness without the global
    fallback."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import nn_colsweep_exact

    tgt = make_cloud(20000, seed=85)
    R = 32  # explicit: auto may floor at 8, collapsing coarse onto fine
    cell = float((tgt.max(0) - tgt.min(0)).max()) / R
    rng = np.random.default_rng(3)
    q = tgt + rng.uniform(-1.2 * cell, 1.2 * cell, tgt.shape)
    q = q[morton_order(q, R)]
    qj = jnp.asarray(q, jnp.float32)
    grid = build_pallas_grid(tgt, R)
    Rc = R // 4
    coarse = build_pallas_grid(tgt, Rc, trange=8192)
    # The fine pass alone must leave stragglers, and the coarse level must
    # certify some of them — or this test exercises nothing.
    _, _, _, cert_f = nn_colsweep(qj, grid, resolution=R)
    _, _, _, cert_c = nn_colsweep(qj, coarse, resolution=Rc, trange=8192)
    cert_f, cert_c = np.asarray(cert_f), np.asarray(cert_c)
    assert not cert_f.all()
    assert (cert_c & ~cert_f).sum() > 100
    m, _nrm, d = nn_colsweep_exact(
        qj, jnp.asarray(tgt, jnp.float32), grid, coarse,
        resolution=R, coarse_resolution=Rc, coarse_trange=8192,
        coarse_budget=32768, brute_passes=8, global_fallback=False,
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m), tgt[i_ref], atol=1e-3)


def test_budget_overflow_global_fallback_ragged_n():
    """More far outliers than the brute budget + ragged (non-tile) N: the
    global all-pairs fallback still delivers exact 1-NN for every query."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import nn_colsweep_exact

    tgt = make_cloud(3000, seed=86)
    rng = np.random.default_rng(4)
    q = np.vstack(
        [
            tgt[: 1111] + rng.normal(0, 0.02, (1111, 3)),
            rng.uniform(-200, 200, (997, 3)),  # >> budget of 1 pass x 128
        ]
    )
    R = auto_resolution_data(tgt)
    q = q[morton_order(q, R)]
    grid = build_pallas_grid(tgt, R)
    m, _nrm, d = nn_colsweep_exact(
        jnp.asarray(q, jnp.float32), jnp.asarray(tgt, jnp.float32), grid,
        resolution=R, brute_batch=128, brute_passes=1, global_fallback=True,
    )
    d_ref, i_ref = cKDTree(tgt).query(q)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m), tgt[i_ref], atol=1e-3)


def test_grouped_tile_order_layout():
    """X-group-aligned layout: full row coverage, padding marked by zero
    weight, and (near-)total certification where Morton tiling leaves
    permanent boundary stragglers."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import grouped_tile_order

    tgt = make_cloud(30000, seed=90)
    rng = np.random.default_rng(5)
    q = tgt + rng.normal(0, 0.01, tgt.shape)
    R = auto_resolution_data(tgt)
    grid = build_pallas_grid(tgt, R)
    rows, w = grouped_tile_order(q, grid, R)
    assert len(rows) % 128 == 0 and len(rows) == len(w)
    real = rows[w > 0]
    np.testing.assert_array_equal(np.sort(real), np.arange(len(q)))

    _, _, _, cert_g = nn_colsweep(
        jnp.asarray(q[rows], jnp.float32), grid, resolution=R
    )
    qm = q[morton_order(q, R)]
    _, _, _, cert_m = nn_colsweep(
        jnp.asarray(qm, jnp.float32), grid, resolution=R
    )
    rate_g = float(np.asarray(cert_g).mean())
    rate_m = float(np.asarray(cert_m).mean())
    assert rate_g >= rate_m
    assert rate_g > 0.99, (rate_g, rate_m)


def test_pallas_registered_cloud_unscrambled():
    """The padded row layout must be undone exactly: the registered cloud
    equals the original source pushed through the recovered transform."""
    from iterativeclosestpoint_tpu.utils.synth import apply_transform_np

    src, tgt, _ = make_registration_pair(n=6000, seed=83, noise_sigma=0.01)
    res = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="pallas", max_iterations=8,
        tolerance=1e-9, return_registered=True,
    )
    expect = apply_transform_np(res.transform, src)
    np.testing.assert_allclose(res.source_registered, expect, atol=1e-3)


@pytest.mark.parametrize("case", ["tiny_n", "collinear_x", "one_cell",
                                  "dup_points"])
def test_degenerate_geometry_exact(case):
    """Degenerate clouds (tiny N, collinear, single-cell, duplicates)
    stay exact through grid build + grouped layout + exact path."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        grouped_tile_order,
        nn_colsweep_exact,
    )

    rng = np.random.default_rng
    if case == "tiny_n":
        q, tgt = rng(0).normal(size=(50, 3)), rng(1).normal(size=(70, 3))
    elif case == "collinear_x":
        q = np.c_[np.linspace(0, 100, 3000), np.zeros(3000), np.zeros(3000)]
        tgt = np.c_[np.linspace(0, 100, 2500), np.zeros(2500), np.zeros(2500)]
    elif case == "one_cell":
        q = np.full((300, 3), 5.0) + rng(2).normal(0, 1e-6, (300, 3))
        tgt = np.full((400, 3), 5.0) + rng(3).normal(0, 1e-6, (400, 3))
    else:
        q = np.repeat(rng(4).normal(size=(10, 3)), 30, axis=0)
        tgt = np.repeat(rng(5).normal(size=(12, 3)), 25, axis=0)

    R = auto_resolution_data(tgt)
    grid = build_pallas_grid(tgt, R)
    rows, w = grouped_tile_order(q, grid, R)
    real = rows[w > 0]
    np.testing.assert_array_equal(np.sort(real), np.arange(len(q)))
    m, _, d = nn_colsweep_exact(
        jnp.asarray(q[rows], jnp.float32), jnp.asarray(tgt, jnp.float32),
        grid, resolution=R,
    )
    d_ref, i_ref = cKDTree(tgt).query(q[rows])
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), tgt[i_ref], atol=1e-4)


def test_icp_with_pallas_backend():
    from iterativeclosestpoint_tpu.ops.se3 import registration_error
    import jax.numpy as jnp2

    src, tgt, T_true = make_registration_pair(n=4000, seed=82, noise_sigma=0.01)
    res_b = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce", max_iterations=30
    )
    res_p = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="pallas", max_iterations=30
    )
    assert res_p.success
    # f32 near-tie argmins may differ between the matmul-form (brute) and
    # diff-form (kernel) distance evaluation; gate on registration quality,
    # not bit-equality of the trajectory.
    err_p = float(
        registration_error(
            jnp2.asarray(res_p.transform), jnp2.asarray(T_true), jnp2.asarray(src)
        )
    )
    err_b = float(
        registration_error(
            jnp2.asarray(res_b.transform), jnp2.asarray(T_true), jnp2.asarray(src)
        )
    )
    assert err_p < max(3 * err_b, 1e-3), f"pallas {err_p} vs brute {err_b}"


def test_normals_packed_and_extracted():
    from iterativeclosestpoint_tpu.ops.normals import estimate_normals_cellpca

    tgt = make_cloud(8000, seed=84)
    R = auto_resolution_data(tgt)
    nrm_ref = estimate_normals_cellpca(tgt, R)
    grid = build_pallas_grid(tgt, R, normals=nrm_ref)
    rng = np.random.default_rng(2)
    q = tgt + rng.normal(0, 0.02, tgt.shape)
    q = q[morton_order(q, R)]
    m, nrm, d, cert = nn_colsweep(jnp.asarray(q, jnp.float32), grid, resolution=R)
    cert = np.asarray(cert)
    d_ref, i_ref = cKDTree(tgt).query(q)
    # Matched normals equal the normals of the matched target points.
    np.testing.assert_allclose(
        np.asarray(nrm)[cert], nrm_ref[i_ref][cert], atol=1e-3
    )


def test_device_grid_build_matches_host():
    """_build_grid_dev reproduces build_pallas_grid bit-for-bit (both
    sorts are stable; same CSR layout, same _FAR padding)."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import _build_grid_dev

    tgt = make_cloud(9000, seed=91)
    R = auto_resolution_data(tgt)
    host = build_pallas_grid(tgt, R)
    tmin, tmax = tgt.min(axis=0), tgt.max(axis=0)
    cell = max(float((tmax - tmin).max()) / R, 1e-9)
    dev = _build_grid_dev(
        jnp.asarray(tgt, jnp.float32),
        jnp.asarray(tmin, jnp.float32),
        jnp.asarray(cell, jnp.float32),
        resolution=R,
        trange=2048,
    )
    np.testing.assert_array_equal(np.asarray(dev.col_start),
                                  np.asarray(host.col_start))
    np.testing.assert_array_equal(np.asarray(dev.tgt_t), np.asarray(host.tgt_t))


def test_grouped_tile_order_device_semantics():
    """Device layout: every real query appears exactly once with weight 1,
    padding replicates in-group rows, and no 128-row tile spans more than
    one x-cell of the target grid (the certificate invariant)."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        grouped_tile_order_device,
    )

    tgt = make_cloud(12000, seed=92)
    rng = np.random.default_rng(5)
    q = tgt + rng.normal(0, 0.05, tgt.shape)
    R = auto_resolution_data(tgt)
    grid = build_pallas_grid(tgt, R)
    rows, w = grouped_tile_order_device(
        jnp.asarray(q, jnp.float32), grid.origin, grid.cell_size,
        resolution=R,
    )
    rows, w = np.asarray(rows), np.asarray(w)
    assert len(rows) % 128 == 0
    real = w > 0
    # Bijection on real rows.
    assert sorted(rows[real]) == list(range(len(q)))
    # Padding rows replicate real queries (valid indices).
    assert rows.min() >= 0 and rows.max() < len(q)
    # Tile x-coherence: all rows of a tile sit in one x-cell.
    origin = np.asarray(grid.origin, np.float64)
    cellsz = float(np.asarray(grid.cell_size))
    xcell = np.clip(((q[rows][:, 0] - origin[0]) / cellsz).astype(int), 0, R - 1)
    per_tile = xcell.reshape(-1, 128)
    assert (per_tile.max(axis=1) == per_tile.min(axis=1)).all()


def test_icp_device_layout_matches_host_layout(monkeypatch):
    """icp_register via the device-built pallas path matches the
    host-built path's trajectory (identical semantics, different
    construction site)."""
    import iterativeclosestpoint_tpu.models.icp as icp_mod

    src, tgt, _ = make_registration_pair(n=6000, seed=93, noise_sigma=0.01)
    kwargs = dict(
        nn_backend="pallas", max_iterations=8, tolerance=0.0,
        dtype=jnp.float32,
    )
    res_dev = icp_register(src, tgt, return_registered=True, **kwargs)

    orig = icp_mod._default_nn

    def host_nn(*a, **k):
        k["device_layout"] = False
        return orig(*a, **k)

    monkeypatch.setattr(icp_mod, "_default_nn", host_nn)
    res_host = icp_register(src, tgt, return_registered=False, **kwargs)

    np.testing.assert_allclose(
        res_dev.history_rmse, res_host.history_rmse, rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        res_dev.transform, res_host.transform, rtol=0, atol=1e-5
    )
    # Registered cloud un-permutes back to the original row order.
    assert res_dev.source_registered.shape == src.shape


def test_pallas_brute_matches_xla_brute():
    """The degenerate one-cell kernel brute path must reproduce the XLA
    brute-force results exactly: same winners (tie order included), same
    matched coordinates, same distances."""
    from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
    from iterativeclosestpoint_tpu.ops.pallas_nn import make_pallas_brute

    tgt = make_cloud(1500, seed=81, kind="terrain")
    # Duplicate a block of points to force distance ties.
    tgt[700:720] = tgt[100:120]
    rng = np.random.default_rng(1)
    q = tgt[:900] + rng.normal(0, 0.05, (900, 3))

    fn, grid = make_pallas_brute(tgt)
    m_k, d_k = fn(jnp.asarray(q, jnp.float32), None, grid)

    idx, d_b = nn_bruteforce(
        jnp.asarray(q, jnp.float32), jnp.asarray(tgt, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(m_k), tgt[np.asarray(idx)].astype(np.float32))
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_b), rtol=0, atol=1e-6)


def test_pallas_brute_plane_normals():
    """Brute kernel with packed normals returns the winner's normal."""
    from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
    from iterativeclosestpoint_tpu.ops.pallas_nn import make_pallas_brute

    tgt = make_cloud(1200, seed=82)
    nrm = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (len(tgt), 1))
    nrm[: len(tgt) // 2] = [1.0, 0.0, 0.0]
    q = tgt[:500] + np.random.default_rng(2).normal(0, 0.02, (500, 3))

    fn, grid = make_pallas_brute(tgt, normals=nrm)
    m_k, d_k, n_k = fn(jnp.asarray(q, jnp.float32), None, grid)
    idx, _ = nn_bruteforce(
        jnp.asarray(q, jnp.float32), jnp.asarray(tgt, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(n_k), nrm[np.asarray(idx)])


def test_tile_split_path_matches_single_call(monkeypatch):
    """Past the SMEM prefetch budget the kernel runs in equal tile parts;
    results must be identical to the single-call path."""
    import iterativeclosestpoint_tpu.ops.pallas_nn as pn

    tgt = make_cloud(4000, seed=83)
    q = tgt[:2000] + np.random.default_rng(3).normal(0, 0.03, (2000, 3))
    R = auto_resolution_data(tgt)
    grid = build_pallas_grid(tgt, R, trange=1024)
    qd = jnp.asarray(q[morton_order(q, R)], jnp.float32)

    m1, n1, d1, c1 = nn_colsweep(qd, grid, resolution=R, slabs=4,
                                 trange=1024)
    # Force a split into ~4 parts (t = 16 tiles at tile_q=128).
    monkeypatch.setattr(pn, "_SMEM_PREFETCH_BUDGET", 4 * 128)
    nn_colsweep._clear_cache()
    m2, n2, d2, c2 = nn_colsweep(qd, grid, resolution=R, slabs=4,
                                 trange=1024)
    nn_colsweep._clear_cache()
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_estimate_grid_params_zcol_regime_refuses_boost():
    """The surface boost is surface-regime-only: when the UNBOOSTED base
    parameters land in the zcol kernel's candidate regime (base trange
    ≥ 2048 at base R ≤ 128 — quasi-volumetric clouds under the boost's
    d ≤ 2.45 gate), estimate_grid_params must return the base numbers so
    the downstream auto-kernel gate evaluates the zcol cost model
    against the same parameters it did pre-boost (round-4 advisor: a
    boosted R=256 would silently disqualify the zcol switch, an
    untested boost/zcol interaction)."""
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn

    # Eight stacked terrain layers: box dimension ≈ 2 (the boost's
    # d-gate passes) but full-z columns hold 8 surfaces of rows, so the
    # base trange blows past the surface regime.
    layers = [make_cloud(50_000, seed=s, extent=100.0) for s in range(8)]
    cloud = np.concatenate(
        [l + np.array([0.0, 0.0, 10.0 * i]) for i, l in enumerate(layers)]
    )
    boosted, base = auto_resolution_data(
        cloud, surface_boost_occupancy=32, return_base=True
    )
    tr_base = pn.auto_trange(cloud, base)
    # Construction guard: this workload must sit exactly on the boundary
    # the gate protects — the raw boost fires, AND the base parameters
    # are in the zcol candidate regime.
    assert boosted == 2 * base and tr_base >= 2048 and base <= 128, (
        boosted, base, tr_base,
    )
    est = pn.estimate_grid_params(cloud)
    assert est[0] == base and est[1] == tr_base and est[3] == base, est
    # The z-window budget is precomputed in the zcol regime (round-5:
    # the grid build otherwise pays the auto_zrange host pass twice on
    # the coarse->fine critical path) and must equal the build-time
    # value so the decision chain stays deterministic.
    assert est[4] == pn.auto_zrange(cloud, base), est


def test_resolve_slab_grid_params_heterogeneous_boost_gate():
    """A dense slab must not force its boosted resolution onto sparser
    slabs whose own occupancy gate refused it (round-4 advisor medium:
    the old max() combine dropped sparse slabs below the measured
    32 pts/occupied-cell collapse edge). The boost applies only when
    EVERY slab clears the gate at the shared boosted R."""
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn
    from iterativeclosestpoint_tpu.ops.cellblock import surface_boost_ok

    dense = make_cloud(1_000_000, seed=3, extent=100.0)
    sparse = make_cloud(8_000, seed=4, extent=100.0)
    base_dense = auto_resolution_data(dense)
    # Construction guard: dense boosts on its own; sparse refuses at the
    # shared boosted R.
    assert auto_resolution_data(
        dense, surface_boost_occupancy=32
    ) == 2 * base_dense
    assert not surface_boost_ok(sparse, 2 * base_dense)

    het = pn.resolve_slab_grid_params(
        [dense, sparse], n_dev=2, n_queries=1_000_000
    )
    assert het["resolution"] == base_dense, het          # boost refused
    assert het["normals_resolution"] == base_dense
    hom = pn.resolve_slab_grid_params(
        [dense, dense], n_dev=2, n_queries=1_000_000
    )
    assert hom["resolution"] == 2 * base_dense, hom      # boost applies
    assert hom["normals_resolution"] == base_dense       # normals: base


def test_auto_trange_properties():
    """Data-adaptive slab range: ladder-quantized within [floor, cap],
    monotone in density, and scaling with per-column mass."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        _TRANGE_LADDER,
        auto_trange,
    )

    sparse = make_cloud(20_000, seed=5)
    dense = make_cloud(200_000, seed=5)
    R = auto_resolution_data(dense)
    tr_sparse = auto_trange(sparse, R)
    tr_dense = auto_trange(dense, R)
    for tr in (tr_sparse, tr_dense):
        assert tr in _TRANGE_LADDER  # trange is a static compile arg:
        # the ladder bounds distinct kernel variants across datasets
    assert tr_sparse <= tr_dense
    # Halving R quadruples per-column mass -> trange must grow.
    assert auto_trange(dense, max(R // 2, 8)) > tr_dense


def test_auto_trange_subsample_estimator_stable(monkeypatch):
    """Above the sample cap the estimator switches to a strided subsample
    (scaled back up); the ladder bucket must match the full-pass answer."""
    from iterativeclosestpoint_tpu.ops import pallas_nn as pn

    cloud = make_cloud(400_000, seed=9)
    R = auto_resolution_data(cloud)
    full = pn.auto_trange(cloud, R)                  # full-pass (stride=1)
    monkeypatch.setattr(pn, "_AUTO_TRANGE_SAMPLE_CAP", 100_000)
    sub = pn.auto_trange(cloud, R)                   # stride=4 subsample
    assert sub in pn._TRANGE_LADDER
    assert abs(pn._TRANGE_LADDER.index(sub)
               - pn._TRANGE_LADDER.index(full)) <= 1


def test_auto_trange_default_factory_exact():
    """The default (auto-trange) device factory stays on the exact path."""
    rng = np.random.default_rng(11)
    tgt = make_cloud(6000, seed=29)
    q = tgt[:3000] + rng.normal(0, 0.05, (3000, 3))

    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        grouped_tile_order_device,
        make_pallas_nn_device,
    )

    nn_fn, state, R = make_pallas_nn_device(tgt)
    grid = state[0]
    rows, weight = grouped_tile_order_device(
        jnp.asarray(q, jnp.float32), grid.origin, grid.cell_size,
        resolution=R,
    )
    qd = jnp.asarray(q, jnp.float32)[rows]
    matched, dist = nn_fn(qd, jnp.asarray(tgt, jnp.float32), state)

    d_true, i_true = cKDTree(tgt).query(q, k=1)
    real = np.asarray(weight) > 0
    np.testing.assert_allclose(
        np.asarray(dist)[real], d_true[np.asarray(rows)[real]], rtol=1e-5,
        atol=1e-5,
    )


def test_exact_tie_decertifies_and_repairs():
    """Exact f32 d² ties (duplicated target points) make the equality
    one-hot multi-hot: the tie-count column must DECERTIFY those queries
    (row-7 contract), and the repair chain must resolve them to the
    first-tie answer (bruteforce order). first_tie=True (the brute
    adapter's mode) keeps in-kernel argmin selection instead."""
    from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
    from iterativeclosestpoint_tpu.ops.pallas_nn import nn_colsweep_exact

    rng = np.random.default_rng(8)
    base = rng.normal(size=(40, 3))
    tgt = np.repeat(base, 3, axis=0)          # every point triplicated
    q = base + rng.normal(0, 0.05, base.shape)
    R = auto_resolution_data(tgt)
    q = q[morton_order(q, R)]
    grid = build_pallas_grid(tgt, R)
    qj = jnp.asarray(q, jnp.float32)

    _, _, _, cert = nn_colsweep(qj, grid, resolution=R)
    assert not np.asarray(cert).any()          # all tied -> all decertified

    _, _, _, cert_ft = nn_colsweep(qj, grid, resolution=R, first_tie=True)
    # argmin mode is immune to ties (remaining decerts on this tiny cloud
    # are ordinary window geometry, not the tie-count column)
    assert np.asarray(cert_ft).mean() > 0.5

    m, _, d = nn_colsweep_exact(
        qj, jnp.asarray(tgt, jnp.float32), grid, resolution=R,
        brute_batch=512, brute_passes=4,
    )
    bi, bd = nn_bruteforce(qj, jnp.asarray(tgt, jnp.float32))
    np.testing.assert_allclose(np.asarray(d), np.asarray(bd), atol=1e-6)
    # f32 comparison: the grid stores f32 coordinates (extraction is
    # bit-exact in f32); tgt here is the f64 original.
    np.testing.assert_array_equal(
        np.asarray(m), np.asarray(tgt, np.float32)[np.asarray(bi)]
    )


# ---------------------------------------------------------------------------
# Z-window column kernel (volume regime)
# ---------------------------------------------------------------------------


def _volume_pair(m=4000, n=1200, seed=9, extent=10.0):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(0, extent, (m, 3)).astype(np.float32)
    q = tgt[rng.choice(m, n, replace=False)] + rng.normal(
        0, 0.02, (n, 3)
    ).astype(np.float32)
    return q.astype(np.float32), tgt


def test_zcol_certified_results_are_exact():
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        _build_zgrid_dev,
        grouped_tile_order_device,
        nn_colsweep_z,
    )

    q, tgt = _volume_pair()
    R, zrange = 8, 384
    tmin = tgt.min(axis=0)
    ext = float((tgt.max(axis=0) - tmin).max())
    cell = jnp.asarray(max(ext / R, 1e-9), jnp.float32)
    org = jnp.asarray(tmin, jnp.float32)
    grid = _build_zgrid_dev(jnp.asarray(tgt), org, cell, resolution=R,
                            zrange=zrange)
    rows, w = grouped_tile_order_device(
        jnp.asarray(q), org, cell, resolution=R, group="xy")
    ql = jnp.asarray(q)[rows]
    m3, nrm, d, cert = nn_colsweep_z(ql, grid, resolution=R, zrange=zrange)
    m3, d, cert = np.asarray(m3), np.asarray(d), np.asarray(cert)

    bi, bd = nn_bruteforce(ql, jnp.asarray(tgt))
    bm, bd = np.asarray(jnp.asarray(tgt)[bi]), np.asarray(bd)
    real = np.asarray(w) > 0
    frac = cert[real].mean()
    assert frac > 0.5, f"certified fraction {frac}"
    sel = cert & real
    np.testing.assert_array_equal(m3[sel], bm[sel])
    np.testing.assert_allclose(d[sel], bd[sel], rtol=1e-6, atol=1e-6)


def test_zcol_exact_chain_repairs_everything():
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        _build_grid_dev,
        _build_zgrid_dev,
        grouped_tile_order_device,
        nn_colsweep_exact,
    )

    q, tgt = _volume_pair(seed=10)
    R, zrange = 8, 384
    tmin = tgt.min(axis=0)
    ext = float((tgt.max(axis=0) - tmin).max())
    cell = jnp.asarray(max(ext / R, 1e-9), jnp.float32)
    cell_c = jnp.asarray(max(ext / 8, 1e-9), jnp.float32)
    org = jnp.asarray(tmin, jnp.float32)
    grid = _build_zgrid_dev(jnp.asarray(tgt), org, cell, resolution=R,
                            zrange=zrange)
    coarse = _build_grid_dev(jnp.asarray(tgt), org, cell_c, resolution=8,
                             trange=4096)
    rows, w = grouped_tile_order_device(
        jnp.asarray(q), org, cell, resolution=R, group="xy")
    ql = jnp.asarray(q)[rows]
    m3, nrm, d = nn_colsweep_exact(
        ql, jnp.asarray(tgt), grid, coarse, resolution=R,
        coarse_resolution=8, trange=zrange, coarse_trange=4096,
        fine="zcol",
    )
    bi, bd = nn_bruteforce(ql, jnp.asarray(tgt))
    real = np.asarray(w) > 0
    np.testing.assert_allclose(
        np.asarray(d)[real], np.asarray(bd)[real], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(m3)[real], np.asarray(jnp.asarray(tgt)[bi])[real]
    )


def test_zcol_full_registration_matches_brute():
    """prepared_nn route with kernel='zcol': full ICP trajectory equals
    the brute-force trajectory on a volumetric cloud."""
    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.ops.pallas_nn import make_pallas_nn_device
    from iterativeclosestpoint_tpu.utils.synth import (
        apply_transform_np,
        random_rigid_transform,
    )

    rng = np.random.default_rng(11)
    tgt = rng.uniform(-5, 5, (3000, 3))
    T = random_rigid_transform(seed=2, max_yaw_deg=3.0,
                               max_pitch_roll_deg=1.0, max_txy=0.2,
                               max_tz=0.1)
    src = apply_transform_np(np.linalg.inv(T), tgt) + rng.normal(
        0, 0.01, tgt.shape)

    offset = (tgt.min(axis=0) + tgt.max(axis=0)) / 2.0
    tgtl = (tgt - offset).astype(np.float32)
    prepared = make_pallas_nn_device(tgtl, resolution=8, kernel="zcol")
    assert prepared[0].layout_group == "xy"
    res_z = icp_register(
        src, tgt, dtype=jnp.float32, prepared_nn=prepared,
        max_iterations=10, tolerance=1e-9,
    )
    res_b = icp_register(
        src, tgt, dtype=jnp.float32, nn_backend="bruteforce",
        max_iterations=10, tolerance=1e-9,
    )
    assert res_z.iterations == res_b.iterations
    np.testing.assert_allclose(res_z.history_rmse, res_b.history_rmse,
                               rtol=1e-5)
    np.testing.assert_allclose(res_z.transform, res_b.transform, atol=1e-5)


def test_kernel_auto_selection_by_regime():
    """kernel='auto' picks the x-slab sweep on surfaces and the z-column
    kernel on volumes (only when its candidate budget actually wins)."""
    from iterativeclosestpoint_tpu.models.icp import icp_register
    from iterativeclosestpoint_tpu.ops.pallas_nn import make_pallas_nn_device
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    terrain = make_cloud(60_000, seed=1, kind="terrain", extent=50.0)
    terrain = (terrain - terrain.mean(0)).astype(np.float32)
    fn_t, _, _ = make_pallas_nn_device(terrain)
    assert fn_t.layout_group == "x"  # sweep

    rng = np.random.default_rng(0)
    vol = rng.uniform(-50, 50, (400_000, 3)).astype(np.float32)
    vol[:, 2] *= 0.2  # the 10:10:1 bench box
    fn_v, _, _ = make_pallas_nn_device(vol)
    assert fn_v.layout_group == "xy"  # z-column kernel


def test_return_certified_marks_exact_rows():
    """return_certified: True rows are PROVEN exact vs brute force; with
    tiny repair budgets and no global fallback some rows may stay False
    (budget overflow), but never falsely certified."""
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        grouped_tile_order_device,
        make_pallas_nn,
        nn_colsweep_exact,
    )

    rng = np.random.default_rng(12)
    tgt = make_cloud(20_000, seed=5, kind="terrain", extent=30.0)
    tgt = (tgt - tgt.mean(0)).astype(np.float32)
    q = (tgt[rng.choice(len(tgt), 3000, replace=False)]
         + rng.normal(0, 2.0, (3000, 3)).astype(np.float32))  # big offsets
    _, state, R = make_pallas_nn(tgt, resolution=16)
    grid, coarse, _ = state
    rows, w = grouped_tile_order_device(
        jnp.asarray(q, jnp.float32), grid.origin, grid.cell_size,
        resolution=R)
    ql = jnp.asarray(q, jnp.float32)[rows]
    m3, nrm, d, cert = nn_colsweep_exact(
        ql, jnp.asarray(tgt), grid, coarse, resolution=R,
        coarse_resolution=max(R // 4, 8), trange=2048,
        brute_batch=256, brute_passes=1, global_fallback=False,
        return_certified=True,
    )
    bi, bd = nn_bruteforce(ql, jnp.asarray(tgt))
    bm = np.asarray(jnp.asarray(tgt)[bi])
    real = np.asarray(w) > 0
    sel = np.asarray(cert) & real
    assert sel.sum() > 0
    np.testing.assert_array_equal(np.asarray(m3)[sel], bm[sel])
    np.testing.assert_allclose(np.asarray(d)[sel], np.asarray(bd)[sel],
                               rtol=1e-6, atol=1e-6)


def test_boundary_strip_certifies_at_fine_level():
    """Out-of-bbox certificate strengthening: source points beyond the
    target's coverage (multi-scan partial-overlap edges) must certify at
    the FINE level via the bbox-gap term — and stay exact — instead of
    falling through the repair chain every iteration."""
    import jax.numpy as jnp

    from iterativeclosestpoint_tpu.ops.bruteforce import nn_bruteforce
    from iterativeclosestpoint_tpu.ops.pallas_nn import (
        build_pallas_grid,
        grouped_tile_order,
        nn_colsweep,
    )
    from iterativeclosestpoint_tpu.utils.synth import make_cloud

    cloud = make_cloud(20_000, seed=8)
    x = cloud[:, 0]
    lo, hi = x.min(), x.max()
    tgt = cloud[x <= lo + 0.6 * (hi - lo)].astype(np.float32)
    # Queries: the overlap region PLUS a strip up to ~15% of the extent
    # beyond the target's x-coverage (true NNs sit at the boundary face,
    # meters away).
    src = cloud[(x >= lo + 0.3 * (hi - lo)) & (x <= lo + 0.75 * (hi - lo))]
    src = (src + np.random.default_rng(0).normal(0, 0.01, src.shape)
           ).astype(np.float32)

    grid = build_pallas_grid(tgt, resolution=16, trange=4096)
    rows, weight = grouped_tile_order(src, grid, 16)
    q = src[rows]
    m, _, d, cert = nn_colsweep(jnp.asarray(q), grid, resolution=16,
                                slabs=4, trange=4096)
    cert = np.asarray(cert) & (np.asarray(weight) > 0)
    real = np.asarray(weight) > 0

    # Exactness wherever certified.
    bi, bd = nn_bruteforce(jnp.asarray(q), jnp.asarray(tgt))
    np.testing.assert_allclose(
        np.asarray(d)[cert], np.asarray(bd)[cert], rtol=1e-6, atol=1e-6
    )
    # The strip queries (beyond the target bbox in x) must certify at
    # high rate — without the gap term they are ALL uncertifiable once
    # their distance exceeds the y-window radius.
    strip = q[:, 0] > tgt[:, 0].max()
    assert strip[real].sum() > 500, "fixture lost its strip"
    frac = cert[strip & real].mean()
    assert frac > 0.95, f"strip certification {frac:.3f}"
