"""Kernel cost models + speed-of-light reporting + profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md §5); BASELINE.md
requires reporting NN-query and covariance-kernel speed-of-light (SoL)
utilization per chip. This module provides the analytic rooflines for the
framework's two hot kernels and a ``jax.profiler`` trace context for deep
dives.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional


@dataclasses.dataclass
class ChipSpec:
    """Peak numbers used for SoL normalization."""

    name: str = "TPU v5e"
    hbm_gbps: float = 819.0          # HBM bandwidth, GB/s
    vpu_tflops: float = 3.9          # f32 element-wise TFLOP/s (8x128x4 ALUs)
    mxu_bf16_tflops: float = 197.0   # dense matmul peak
    vmem_mb: float = 16.0


V5E = ChipSpec()


@dataclasses.dataclass
class KernelReport:
    name: str
    elapsed_s: float
    flops: float
    bytes_hbm: float
    chip: ChipSpec = dataclasses.field(default_factory=lambda: V5E)

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.elapsed_s / 1e12

    @property
    def achieved_gbps(self) -> float:
        return self.bytes_hbm / self.elapsed_s / 1e9

    @property
    def sol_compute(self) -> float:
        return self.achieved_tflops / self.chip.vpu_tflops

    @property
    def sol_memory(self) -> float:
        return self.achieved_gbps / self.chip.hbm_gbps

    @property
    def sol(self) -> float:
        """Utilization against the binding resource (roofline)."""
        return max(self.sol_compute, self.sol_memory)

    def line(self) -> str:
        return (
            f"{self.name}: {self.elapsed_s*1e3:.1f} ms, "
            f"{self.achieved_tflops:.2f} TFLOP/s ({self.sol_compute:.0%} VPU), "
            f"{self.achieved_gbps:.0f} GB/s ({self.sol_memory:.0%} HBM) "
            f"-> SoL {self.sol:.0%}"
        )


def nn_kernel_report(
    n_queries: int, tile_q: int, slabs: int, trange: int, elapsed_s: float,
    chip: ChipSpec = V5E, name: str = "nn-slab-sweep",
) -> KernelReport:
    """Roofline model of the sweep-family NN kernels (ops/pallas_nn.py):
    per tile, `slabs` DMA fetches of (8, trange) f32 and a dense
    (tile_q × slabs·trange) distance + argmin + one-hot pass (~14 VPU ops
    per pair). The z-column volume kernel (nn_colsweep_z) shares the pass
    structure with slabs=xy_slots and trange=zrange — pass
    name="nn-zcol"."""
    tiles = -(-n_queries // tile_q)
    cand = slabs * trange
    flops = tiles * tile_q * cand * 14.0
    bytes_hbm = tiles * (slabs * 8 * trange * 4 + tile_q * 8 * 4 * 2)
    return KernelReport(name, elapsed_s, flops, bytes_hbm, chip)


def covariance_kernel_report(
    n_points: int, elapsed_s: float, chip: ChipSpec = V5E
) -> KernelReport:
    """Roofline of the rejection+moments stage (hot loop B,
    icpengine.cpp:263-337 as one pass): one streaming read of
    (src, matched, dist, weight) ≈ 28 B/point, ~30 flops/point (mask,
    5 masked sums, 9-term outer). The production loop runs this stage as
    XLA-fused reductions — a hand-written Pallas fusion was measured NOT
    faster (see SCALING.md 'hot loop B waiver'), so the report is a
    roofline check on the XLA form."""
    flops = n_points * 30.0
    bytes_hbm = n_points * (7 * 4)
    return KernelReport("reject+moments", elapsed_s, flops, bytes_hbm, chip)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
