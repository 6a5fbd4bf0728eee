"""Per-host sharded LAS ingest: decode only the rows this process owns.

The reference's batch reader exists so clouds larger than memory can be
processed in slices (``readLASBatch``, lasio.cpp:212-300). The multi-host
equivalent (SURVEY.md C5 "streaming/sharded ingest per host"): each
process byte-range-seeks into the LAS file (io.las.read_las_range) and
decodes only the row ranges of its *addressable* shards, then
``make_array_from_callback`` assembles the global sharded array — no
process ever materializes the full cloud (round-2 verdict W4: ``to_global``
built global arrays from full per-process host copies, so per-host RAM
capped exactly the runs the sharded paths exist for).

The centering offset comes from the LAS header's bounds block (written by
every conforming writer, including ours — byte offsets 179-226,
lasio.cpp:177-182), so no decode pass is needed to center.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from iterativeclosestpoint_tpu.io.las import (
    LASHeader,
    read_header,
    read_las_range,
)
from iterativeclosestpoint_tpu.parallel.mesh import (
    Mesh,
    mesh_dp_axes,
    to_global_rows,
)


def header_center(hdr: LASHeader) -> np.ndarray:
    """The f64 centering offset from the header bounds block (no decode
    pass; identical to hostmath.center_offset of the decoded cloud when
    the writer recorded true bounds, as ours and the reference do)."""
    return (
        np.asarray(hdr.bounds_min, np.float64)
        + np.asarray(hdr.bounds_max, np.float64)
    ) / 2.0


def load_las_sharded(
    path: str | Path,
    mesh: Mesh,
    *,
    offset: np.ndarray,
    dtype=np.float32,
    stride: int = 1,
    max_points: int = 0,
    stats: Optional[dict] = None,
):
    """Load a LAS cloud as a global row-sharded device array, decoding
    only this process's shards.

    Args:
      offset: f64 centering offset (the target frame's ``center_offset``;
        use :func:`header_center` of the *target* header to avoid any
        full decode).
      stride: keep every stride-th point (decode-time downsample,
        icp_registration.cpp:857 semantics).
      stats: optional dict; on return ``stats["peak_rows"]`` /
        ``stats["total_rows"]`` record the largest single decode and the
        total rows decoded by THIS process — the ingest contract's
        observable (tests assert peak < N).

    Returns:
      (src_global, weight_global, n_rows, header): axis-0 sharded over
      all mesh axes, padded to the device count with zero-weight rows.
    """
    path = Path(path)
    hdr = read_header(path)
    n_file = hdr.point_count
    if max_points > 0:
        n_file = min(n_file, max_points)
    n = -(-n_file // stride)  # logical rows after stride
    n_dev = mesh.devices.size
    n_pad = -(-n // n_dev) * n_dev
    offset = np.asarray(offset, np.float64)
    dp = mesh_dp_axes(mesh)

    def fetch_rows(lo, hi):
        out = np.zeros((hi - lo, 3), dtype)
        hi_real = min(hi, n)
        if hi_real > lo:
            pts, _ = read_las_range(
                path, lo * stride, min(hi_real * stride, n_file),
                step=stride, header=hdr,
            )
            out[: len(pts)] = (pts - offset).astype(dtype)
            if stats is not None:
                stats["peak_rows"] = max(stats.get("peak_rows", 0), len(pts))
                stats["total_rows"] = stats.get("total_rows", 0) + len(pts)
        return out

    def fetch_weight(lo, hi):
        w = np.zeros(hi - lo, dtype)
        w[: max(min(hi, n) - lo, 0)] = 1.0
        return w

    src = to_global_rows((n_pad, 3), mesh, P(dp), fetch_rows, dtype)
    wgt = to_global_rows((n_pad,), mesh, P(dp), fetch_weight, dtype)
    return src, wgt, n, hdr
