"""Checkpoint/resume for long gradient-descent runs on metric parameters.

The reference only persists settings (SURVEY §5 — simulation state is
re-derivable per frame); the differentiable-rendering capability adds real
training state worth checkpointing: params, optimizer state, step counter.
JSON + npz keeps it dependency-free and inspectable.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import numpy as np


def save_checkpoint(path: str | Path, step: int, params: dict,
                    opt_state: dict | None = None,
                    extra: dict | None = None) -> None:
    """Atomic checkpoint write (directory with meta.json + arrays.npz)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    arrays = {f"params/{k}": np.asarray(v) for k, v in params.items()}
    if opt_state:
        arrays.update(
            {f"opt/{k}": np.asarray(v) for k, v in opt_state.items()}
        )

    # np.savez appends ".npz" unless the name already ends with it, so the
    # temp file must carry the suffix or the atomic rename moves an empty
    # file into place.
    fd, tmp = tempfile.mkstemp(dir=str(path), suffix=".tmp.npz")
    os.close(fd)
    np.savez(tmp, **arrays)
    os.replace(tmp, path / "arrays.npz")

    meta = {"step": int(step), "extra": extra or {}}
    fd, tmp = tempfile.mkstemp(dir=str(path), suffix=".json.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path / "meta.json")


def load_checkpoint(path: str | Path):
    """Returns ``(step, params, opt_state, extra)`` or None if absent."""
    path = Path(path)
    if not (path / "meta.json").exists():
        return None
    meta = json.loads((path / "meta.json").read_text())
    data = np.load(path / "arrays.npz")
    params = {
        k.split("/", 1)[1]: data[k] for k in data.files
        if k.startswith("params/")
    }
    opt = {
        k.split("/", 1)[1]: data[k] for k in data.files if k.startswith("opt/")
    }
    return meta["step"], params, opt, meta.get("extra", {})
