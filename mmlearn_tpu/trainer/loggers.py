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
        import jax

        if jax.process_index() != 0:  # one console stream per pod
            return
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
        import jax

        # rank-gate like the wandb/tensorboard loggers: on a pod with a
        # shared save_dir, every process appending duplicates steps and
        # interleaves partial lines
        if jax.process_index() != 0:
            return
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
        import jax

        if jax.process_index() != 0:
            return
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
            import jax

            if jax.process_index() != 0:
                # rank-0 only (Lightning behavior): each pod host would
                # otherwise open its own duplicate wandb run and fight over
                # a configured resume id
                return
        except Exception:  # pragma: no cover - jax not initialized
            pass
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


@store(group="trainer/logger", name="TensorBoardLogger", populate_full_signature=False)
class TensorBoardLogger(Logger):
    """TensorBoard event-file logger (Lightning's *default* logger — the
    reference gets it implicitly from ``Trainer(logger=True)``; wired
    explicitly here). Uses ``torch.utils.tensorboard`` (the CPU torch wheel
    ships it); a no-op with a warning if tensorboard isn't importable.

    Event files land in ``<save_dir>/<name>/version_<n>/`` mirroring
    Lightning's directory convention, so existing TensorBoard workflows
    (``tensorboard --logdir outputs``) work unchanged.
    """

    def __init__(
        self,
        save_dir: str = "outputs",
        name: str = "lightning_logs",
        version: Optional[int] = None,
    ) -> None:
        self._writer = None
        self._log_dir = None
        try:
            import jax

            if jax.process_index() != 0:
                # rank-0 only (Lightning behavior): every process scanning
                # for version_<n> at once races on a shared filesystem and
                # interleaves event streams into one directory
                return
        except Exception:  # pragma: no cover - jax not initialized
            pass
        try:
            from torch.utils.tensorboard import SummaryWriter
        except Exception as err:  # pragma: no cover - tensorboard missing
            logger.warning(
                "tensorboard unavailable (%s); TensorBoardLogger is a no-op",
                err,
            )
            return
        root = os.path.join(save_dir, name)
        if version is None:
            version = 0
            if os.path.isdir(root):
                taken = [
                    int(d.split("_", 1)[1])
                    for d in os.listdir(root)
                    if d.startswith("version_") and d.split("_", 1)[1].isdigit()
                ]
                version = max(taken) + 1 if taken else 0
        self._log_dir = os.path.join(root, f"version_{version}")
        self._writer = SummaryWriter(log_dir=self._log_dir)

    @property
    def log_dir(self) -> Optional[str]:
        return self._log_dir

    def log_metrics(self, metrics: Mapping[str, Any], step: int) -> None:
        if self._writer is None:
            return
        for k, v in metrics.items():
            try:
                self._writer.add_scalar(k, float(v), global_step=step)
            except (TypeError, ValueError):
                continue  # non-scalar (strings etc.) — scalars only

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        if self._writer is None:
            return
        flat = {
            k: v if isinstance(v, (int, float, bool, str)) else str(v)
            for k, v in params.items()
        }
        self._writer.add_hparams(flat, metric_dict={}, run_name=".")

    def finalize(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
