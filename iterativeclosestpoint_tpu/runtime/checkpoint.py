"""Checkpoint / resume for registration runs.

The reference has no compute checkpointing (SURVEY.md §5: settings-only
persistence, an empty restoreLastSession stub at mainwindow.cpp:145-152);
its per-iteration transform history is a de-facto resumable record. Here
that becomes explicit: per-iteration state is the small pytree
(iteration, cumulative transform, rmse trail), serialized after each run
(or mid-run via the callback), and ``--resume`` continues the loop by
feeding the saved cumulative transform as the initial transform.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np


def save_checkpoint(
    path: str | Path,
    *,
    iteration: int,
    transform: np.ndarray,
    rmse_history,
    config: Optional[dict] = None,
    source_path: str = "",
    target_path: str = "",
) -> None:
    payload = {
        "version": 1,
        "iteration": int(iteration),
        "transform": np.asarray(transform, np.float64).tolist(),
        "rmse_history": [float(r) for r in rmse_history],
        "config": config or {},
        "source_path": source_path,
        "target_path": target_path,
    }
    p = Path(path)
    tmp = p.with_suffix(p.suffix + ".tmp")
    tmp.write_text(json.dumps(payload, indent=1))
    tmp.replace(p)  # atomic on POSIX


def load_checkpoint(path: str | Path) -> dict:
    d = json.loads(Path(path).read_text())
    d["transform"] = np.asarray(d["transform"], np.float64)
    return d


def resume_arguments(ckpt: dict, max_iterations: int) -> dict:
    """kwargs patch for icp_register to continue a checkpointed run:
    start from the saved cumulative transform with the remaining
    iteration budget."""
    remaining = max(1, max_iterations - ckpt["iteration"])
    return {
        "initial_transform": ckpt["transform"],
        "max_iterations": remaining,
    }
