"""Device-mesh helpers.

The reference has no distributed execution at all (SURVEY.md §2: its only
concurrency is two QtConcurrent worker threads); the scaling axis it copes
with by *downsampling* (stride-50, icp_registration.cpp:857) becomes here a
data-parallel shard of source points over a ``jax.sharding.Mesh``, with
per-iteration scalar/centroid/covariance statistics reduced by ``psum``
over ICI (the reductions at icpengine.cpp:234-278 and the 3×3 covariance
at icpengine.cpp:82-90).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    devices=None,
) -> Mesh:
    """1-D device mesh over the first ``n_devices`` local devices.

    For multi-host pods, call ``jax.distributed.initialize`` first and pass
    ``devices=jax.devices()``; the DP axis then spans hosts (DCN) × chips
    (ICI).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axis_names) == 1:
        return Mesh(arr, axis_names)
    raise ValueError("only 1-D meshes supported so far")


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Initialize JAX distributed for an N-host pod slice and return the
    global dp mesh (DCN across hosts × ICI across chips).

    On single-host runs this is a no-op mesh over local devices. On a pod
    slice, call on every host (arguments can come from the cluster
    environment; jax.distributed auto-detects on Cloud TPU).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return make_mesh(devices=jax.devices())


def pad_to_multiple(x: np.ndarray, m: int):
    """Pad axis 0 of ``x`` to a multiple of ``m`` (zeros); returns
    (padded, weight) where weight is 1.0 for real rows, 0.0 for padding."""
    n = len(x)
    n_pad = -(-n // m) * m
    w = np.zeros(n_pad, x.dtype)
    w[:n] = 1.0
    if n_pad == n:
        return x, w
    out = np.zeros((n_pad,) + x.shape[1:], x.dtype)
    out[:n] = x
    return out, w
