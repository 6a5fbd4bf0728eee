"""Stage-attribution timing for the registration pipeline.

The headline bench is a *blended* full-pipeline number (host prep +
uploads + coarse pass + fine loop). When it moves round-over-round the
cause must be attributable from the bench output alone (round-2 verdict
W1: a 13% regression appeared while the hot kernel itself got faster,
and nothing in BENCH_r02.json could say where the time went). This
module lets the production code paths (models/multiscale.py,
models/icp.py) report per-stage wall time with *hard device syncs* at
stage boundaries, without changing any signature: a contextvar carries
the active collector, and every ``stage(...)`` block is a no-op when no
collector is active (zero overhead on the normal path).

Sync discipline (CLAUDE.md): ``block_until_ready`` may return early
through the device tunnel; the reliable drain is a 1-element pull of a
stage output (~35 ms fixed) — TPU dispatch is in-order, so the last
output being ready implies the queue is empty. Synced attribution runs
therefore *serialize* stages that normally overlap (the coarse pass is
designed to hide the big uploads); the breakdown is an attribution
tool, and its total is an upper bound on the blended number.
"""

from __future__ import annotations

import contextlib
import contextvars
import time

import numpy as np

_active: contextvars.ContextVar = contextvars.ContextVar(
    "icp_stage_collector", default=None
)


class StageCollector:
    """Accumulates (stage name -> seconds, metadata)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.stages: dict = {}  # name -> seconds (accumulated)
        self.meta: dict = {}  # name -> dict
        self._prefix: list = []

    def add(self, name: str, dt: float, **meta):
        self.stages[name] = self.stages.get(name, 0.0) + dt
        if meta:
            m = self.meta.setdefault(name, {})
            for k, v in meta.items():
                m[k] = m.get(k, 0) + v if isinstance(v, (int, float)) else v

    def qualified(self, name: str) -> str:
        return "/".join(self._prefix + [name])

    def lines(self):
        """Human-readable per-stage lines, insertion order."""
        out = []
        for name, dt in self.stages.items():
            extra = ""
            m = self.meta.get(name, {})
            if "bytes" in m:
                mb = m["bytes"] / 1e6
                extra = f" ({mb:.1f} MB, {mb / max(dt, 1e-9):.0f} MB/s)"
            out.append(f"{name}: {dt * 1e3:.0f} ms{extra}")
        return out


def _drain(arrays) -> None:
    """Hard-sync the device queue via a 1-element pull of ``arrays``'s
    last device leaf (no-op for host-only pytrees)."""
    import jax
    import jax.numpy as jnp

    leaves = [
        x
        for x in jax.tree_util.tree_leaves(arrays)
        if isinstance(x, jax.Array)
    ]
    if leaves:
        np.asarray(jnp.ravel(leaves[-1])[:1])


@contextlib.contextmanager
def stage(name: str, **meta):
    """Time a pipeline stage. Yields ``done(outputs)`` — call it with the
    stage's device outputs to hard-sync before the clock stops (only when
    a collector with sync=True is active; otherwise a no-op)."""
    col = _active.get()
    if col is None:
        yield lambda *_: None
        return
    qname = col.qualified(name)
    t0 = time.perf_counter()
    yield (_drain if col.sync else (lambda *_: None))
    col.add(qname, time.perf_counter() - t0, **meta)


@contextlib.contextmanager
def scope(name: str):
    """Prefix inner stage names (e.g. coarse/ vs fine/) and record the
    scope's own total under ``name``."""
    col = _active.get()
    if col is None:
        yield
        return
    qname = col.qualified(name)
    col._prefix.append(name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        col._prefix.pop()
        col.add(qname, time.perf_counter() - t0)


@contextlib.contextmanager
def collect(sync: bool = True):
    """Activate stage collection for the dynamic extent of the block."""
    col = StageCollector(sync=sync)
    tok = _active.set(col)
    try:
        yield col
    finally:
        _active.reset(tok)


def active() -> "StageCollector | None":
    return _active.get()
