"""runtime/timing.py: the bench's stage-attribution collector."""

import jax.numpy as jnp
import numpy as np

from iterativeclosestpoint_tpu.runtime.timing import (
    StageCollector,
    active,
    collect,
    scope,
    stage,
)


def test_stage_noop_without_collector():
    assert active() is None
    with stage("anything") as done:
        done(jnp.ones(3))  # must be a no-op, not an error
    assert active() is None


def test_collect_records_stages_and_scopes():
    with collect(sync=True) as col:
        with stage("upload", bytes=1000) as done:
            x = jnp.arange(8.0)
            done(x)
        with scope("fine"):
            with stage("loop") as done:
                y = x * 2
                done(y)
    assert "upload" in col.stages and col.stages["upload"] >= 0
    assert col.meta["upload"]["bytes"] == 1000
    assert "fine/loop" in col.stages
    assert "fine" in col.stages
    assert col.stages["fine"] >= col.stages["fine/loop"]
    lines = col.lines()
    assert any(line.startswith("upload:") and "MB" in line for line in lines)
    assert active() is None  # context restored


def test_stage_accumulates_across_calls():
    with collect(sync=False) as col:
        for _ in range(3):
            with stage("upload", bytes=10):
                pass
    assert col.meta["upload"]["bytes"] == 30


def test_drain_handles_host_only_pytrees():
    with collect(sync=True) as col:
        with stage("host") as done:
            done({"a": np.ones(3), "b": 1.0})  # no jax leaves: no-op
    assert "host" in col.stages


def test_collector_exception_restores_context():
    try:
        with collect(sync=False):
            assert isinstance(active(), StageCollector)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert active() is None
