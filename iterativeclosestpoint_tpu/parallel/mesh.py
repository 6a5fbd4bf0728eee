"""Device-mesh helpers.

The reference has no distributed execution at all (SURVEY.md §2: its only
concurrency is two QtConcurrent worker threads); the scaling axis it copes
with by *downsampling* (stride-50, icp_registration.cpp:857) becomes here a
data-parallel shard of source points over a ``jax.sharding.Mesh``, with
per-iteration scalar/centroid/covariance statistics reduced by ``psum``
over ICI (the reductions at icpengine.cpp:234-278 and the 3×3 covariance
at icpengine.cpp:82-90).

Multi-host: ``init_multihost`` wraps ``jax.distributed.initialize`` and
returns the 2-D (hosts × chips) mesh — the ``host`` axis rides DCN, the
``chip`` axis ICI. The ICP paths shard source rows over ALL mesh axes and
psum over the axis tuple, so the same code runs 1-D single-host and 2-D
multi-host meshes (mechanically tested by tests/test_multihost.py with two
`jax.distributed` CPU processes over Gloo).
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
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Device mesh over the first ``n_devices`` local devices.

    1-D by default (axis ``dp``). For a 2-D (hosts × chips) mesh pass
    ``axis_names=("host", "chip")`` and ``shape=(n_hosts, chips_per_host)``
    — or use ``init_multihost`` which derives the shape from the process
    layout. ``jax.devices()`` orders devices by process, so reshaping to
    (processes, local devices) puts each row on one host.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if shape is not None:
        if len(shape) != len(axis_names):
            raise ValueError(
                f"shape {shape} does not match axis_names {axis_names}"
            )
        arr = arr.reshape(tuple(shape))
    elif len(axis_names) != 1:
        raise ValueError("pass shape= for multi-axis meshes")
    return Mesh(arr, axis_names)


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    heartbeat_timeout_seconds: Optional[int] = None,
) -> Mesh:
    """Initialize JAX distributed for an N-host pod slice and return the
    global (hosts × chips) mesh: axis ``host`` over DCN, axis ``chip``
    over ICI. On single-process runs this is a 1-D ``dp`` mesh over local
    devices (no distributed init needed).

    Call on every host; arguments can come from the cluster environment
    (jax.distributed auto-detects on Cloud TPU when they are omitted but
    ``num_processes`` > 1 is implied by the environment).

    ``heartbeat_timeout_seconds`` is the failed-host detection bound
    (SURVEY.md §5): when a peer process dies mid-run (SIGKILL,
    preemption, hardware loss), the JAX coordination service notices the
    missed heartbeats within this window and TERMINATES the surviving
    processes with a fatal "task died" diagnostic instead of letting
    them block forever in a collective. Recovery = restart on a reformed
    mesh and ``--resume`` from the rolling segment checkpoint
    (runtime/checkpoint.py — the carry makes the continuation
    bit-identical on a mesh with the same global shard count; tested
    mechanically by tests/test_multihost.py::
    test_failure_injection_sigkill_detect_and_resume). None keeps the
    JAX default (100 s)."""
    kw = {}
    if heartbeat_timeout_seconds is not None:
        kw["heartbeat_timeout_seconds"] = heartbeat_timeout_seconds
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
    elif kw and num_processes is None and jax.process_count() == 1:
        # Cloud-TPU auto-detection path (arguments omitted, cluster
        # described by the environment): the timeout must reach
        # jax.distributed.initialize or the detection bound silently
        # stays at the 100 s default — initialize here with the
        # auto-detector. Raises on a non-cluster host: the caller
        # explicitly asked for failed-host detection, so a silent
        # single-process fallback would be worse.
        jax.distributed.initialize(**kw)
    if jax.process_count() > 1:
        n_proc = jax.process_count()
        n_local = len(jax.local_devices())
        return make_mesh(
            axis_names=("host", "chip"), shape=(n_proc, n_local)
        )
    return make_mesh(devices=jax.devices())


def mesh_dp_axes(mesh: Mesh) -> tuple:
    """The axis-name tuple the ICP paths shard/psum over: ALL mesh axes
    (a 1-D ``dp`` mesh and a 2-D host×chip mesh run the same code)."""
    return tuple(mesh.axis_names)


def to_global(x: np.ndarray, mesh: Mesh, spec) -> jax.Array:
    """Build a (possibly multi-process global) device array from a numpy
    array every process holds in full.

    Single-process: a plain device_put. Multi-process: each process
    fills its addressable shards from its full host copy
    (``make_array_from_callback``), yielding the global sharded array
    shard_map needs in multi-controller mode.
    """
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
    return jax.device_put(x, sh)


def to_global_rows(shape, mesh: Mesh, spec, fetch, dtype=np.float32):
    """Global row-sharded device array whose shards are produced on
    demand: ``fetch(lo, hi)`` returns rows [lo, hi) of the logical global
    array (shape ``shape``, axis 0 sharded per ``spec``).

    The per-shard-callback form of :func:`to_global` (round-2 verdict W4):
    only the *addressable* shards of this process are ever fetched, so no
    process materializes the full array — the multi-host ingest contract
    SURVEY.md C5 names for clouds beyond per-host RAM. ``fetch`` may hit
    disk (io.las.read_las_range) or synthesize padding rows.
    """
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    cache: dict = {}

    def cb(idx):
        r = idx[0] if idx else slice(None)
        lo = r.start or 0
        hi = r.stop if r.stop is not None else shape[0]
        key = (lo, hi)
        if key not in cache:
            cache[key] = np.asarray(fetch(lo, hi), dtype)
        block = cache[key]
        rest = tuple(idx[1:])
        return block[(slice(None),) + rest] if rest else block

    return jax.make_array_from_callback(tuple(shape), sh, cb)


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
