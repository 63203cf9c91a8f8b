"""Metric loggers: stdout, JSONL/CSV file, wandb (gated).

Replaces the Lightning logger surface
(/root/reference/mmlearn/conf/__init__.py:428-456, pre-wired WandbLogger).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Mapping, Optional

from mmlearn_tpu.conf import store

logger = logging.getLogger(__name__)


class Logger:
    def log_metrics(self, metrics: Mapping[str, Any], step: int) -> None: ...

    def log_hyperparams(self, params: Mapping[str, Any]) -> None: ...

    def finalize(self) -> None: ...


@store(group="trainer/logger", name="ConsoleLogger", populate_full_signature=False)
class ConsoleLogger(Logger):
    def __init__(self, every_n_steps: int = 1) -> None:
        self.every_n_steps = every_n_steps

    def log_metrics(self, metrics: Mapping[str, Any], step: int) -> None:
        if step % self.every_n_steps != 0:
            return
        parts = []
        for k, v in metrics.items():
            try:
                parts.append(f"{k}={float(v):.5g}")
            except (TypeError, ValueError):
                parts.append(f"{k}={v}")
        logger.info("step %d | %s", step, " ".join(parts))

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        logger.info("hyperparams: %s", params)


@store(group="trainer/logger", name="JSONLLogger", populate_full_signature=False)
class JSONLLogger(Logger):
    """Append one JSON object per logged step to ``<dir>/metrics.jsonl``."""

    def __init__(self, save_dir: str = "outputs") -> None:
        self.save_dir = save_dir
        self._file = None

    def _ensure(self):
        if self._file is None:
            os.makedirs(self.save_dir, exist_ok=True)
            self._file = open(os.path.join(self.save_dir, "metrics.jsonl"), "a")
        return self._file

    def log_metrics(self, metrics: Mapping[str, Any], step: int) -> None:
        record = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = str(v)
        f = self._ensure()
        f.write(json.dumps(record) + "\n")
        f.flush()

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        self._ensure()
        with open(os.path.join(self.save_dir, "hparams.json"), "w") as f:
            json.dump(params, f, indent=2, default=str)

    def finalize(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None


@store(group="trainer/logger", name="WandbLogger", populate_full_signature=False)
class WandbLogger(Logger):
    """Weights & Biases logger (no-op if wandb isn't installed).

    Reference pre-wiring: project from ``$WANDB_PROJECT``, resume="allow"
    (/root/reference/mmlearn/conf/__init__.py:436-451).
    """

    def __init__(
        self,
        name: Optional[str] = None,
        project: Optional[str] = None,
        save_dir: str = "outputs",
        tags: Optional[list] = None,
        resume: str = "allow",
        id: Optional[str] = None,
    ) -> None:
        self._run = None
        try:
            import wandb

            self._run = wandb.init(
                name=name,
                project=project or os.environ.get("WANDB_PROJECT"),
                dir=save_dir,
                tags=tags,
                resume=resume,
                id=id,
            )
        except Exception as err:  # pragma: no cover - wandb not installed
            logger.warning("wandb unavailable (%s); WandbLogger is a no-op", err)

    def log_metrics(self, metrics: Mapping[str, Any], step: int) -> None:
        if self._run is not None:
            self._run.log(dict(metrics), step=step)

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        if self._run is not None:
            self._run.config.update(dict(params), allow_val_change=True)

    def finalize(self) -> None:
        if self._run is not None:
            self._run.finish()
