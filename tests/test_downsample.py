"""Downsampling ops (C1 downsample semantics + voxel variants)."""

import numpy as np

from iterativeclosestpoint_tpu.ops.downsample import (
    downsample_stride,
    downsample_voxel,
    downsample_voxel_stride,
)
from iterativeclosestpoint_tpu.utils.synth import make_cloud


def test_stride_hits_target_size():
    pts = make_cloud(10_000, seed=1)
    out = downsample_stride(pts, 300)
    assert 250 <= len(out) <= 300
    np.testing.assert_array_equal(out[0], pts[0])
    # No-op when already small enough.
    assert len(downsample_stride(pts, 20_000)) == 10_000


def test_voxel_centroids_cover_cloud():
    pts = make_cloud(20_000, seed=2)
    out = downsample_voxel(pts, voxel_size=5.0)
    assert 10 < len(out) < 2_000
    # Every centroid lies inside the cloud bounds.
    assert (out >= pts.min(0) - 1e-9).all() and (out <= pts.max(0) + 1e-9).all()
    # Finer voxels → more points.
    assert len(downsample_voxel(pts, 2.0)) > len(out)


def test_voxel_stride_keeps_original_points():
    pts = make_cloud(5_000, seed=3)
    out = downsample_voxel_stride(pts, voxel_size=4.0)
    # Each kept point is an exact row of the input.
    assert len(out) < len(pts)
    view = {tuple(p) for p in np.round(pts, 9)}
    assert all(tuple(p) in view for p in np.round(out, 9))
