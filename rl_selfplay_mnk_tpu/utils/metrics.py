"""Experiment tracking: W&B when available, local JSONL always.

The reference logs through wandb inline (SURVEY.md §5 "Metrics/logging"):
``wandb.init(config/project/group/tags)``, per-iteration ``training/*``
scalars keyed by env step, ``validation/vs_benchmark/*``, error records.
This logger keeps the same key names and step-keyed semantics, but degrades
gracefully to a JSONL file + stdout when wandb is not importable or not
configured (this image has no wandb and zero egress).
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """wandb-like facade: ``log(dict, step)`` / ``config`` / ``finish()``."""

    def __init__(
        self,
        project: str = "mnk",
        run_name: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        group: Optional[str] = None,
        tags: Optional[list] = None,
        out_dir: str = "runs",
        use_wandb: bool = True,
    ):
        self.config = dict(config or {})
        self.run_name = run_name or time.strftime("%Y%m%d_%H%M%S")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project=project,
                    name=run_name,
                    config=config,
                    group=group,
                    tags=tags,
                )
                self.run_name = self._wandb.name or self.run_name
            except Exception:
                self._wandb = None

        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, f"{self.run_name}.jsonl")
        self._fh = open(self._path, "a")
        self._fh.write(
            json.dumps({"_type": "config", "config": _jsonable(self.config)}) + "\n"
        )
        self._fh.flush()

    @property
    def jsonl_path(self) -> str:
        return self._path

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        record = {"_step": step, "_time": time.time(), **_jsonable(metrics)}
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def watch(self, *args, **kwargs) -> None:
        """Gradient-histogram watch (reference train.py:94) — wandb-only."""
        if self._wandb is not None:
            try:
                self._wandb.watch(*args, **kwargs)
            except Exception:
                pass

    def finish(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()


class NullMetricsLogger:
    """No-op logger for non-coordinator processes in multi-host runs: every
    process drives the same train loop, only process 0 writes metrics
    (parallel/mesh.py is_coordinator). API-compatible with MetricsLogger."""

    def __init__(self, run_name: Optional[str] = None, config=None, **_):
        self.config = dict(config or {})
        self.run_name = run_name or time.strftime("%Y%m%d_%H%M%S")
        self.jsonl_path = os.devnull

    def log(self, metrics, step=None) -> None:
        pass

    def watch(self, *args, **kwargs) -> None:
        pass

    def finish(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass


def _jsonable(d: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        # Non-finite floats would serialize as bare NaN/Infinity tokens —
        # Python-specific extensions that strict JSON consumers (jq,
        # non-Python tooling) reject, exactly on the diverged runs one most
        # needs to inspect. Stringify them instead.
        if isinstance(v, float) and not math.isfinite(v):
            out[k] = str(v)
            continue
        try:
            json.dumps(v, allow_nan=False)
            out[k] = v
        except (TypeError, ValueError):
            out[k] = str(v)
    return out
