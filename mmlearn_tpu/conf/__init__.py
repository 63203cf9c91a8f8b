"""Configuration system for mmlearn-tpu.

Self-contained reimplementation of the reference's Hydra/hydra-zen layer
(/root/reference/mmlearn/conf/__init__.py): a config-group store that modules
register into at import time, ``builds()`` to turn constructor signatures into
overridable config nodes, experiment-YAML composition with ``defaults`` lists,
and CLI dot-path overrides. See ``compose.py`` for the override grammar.

The top-level schema (:func:`base_config`) mirrors ``MMLearnConf``
(/root/reference/mmlearn/conf/__init__.py:94-173): experiment_name, job_type,
seed, datasets/dataloader for train/val/test, task, trainer, tags,
resume_from_checkpoint, strict_loading.
"""

from __future__ import annotations

import enum
import time
from typing import Any, Sequence

from mmlearn_tpu.conf.config import (
    MISSING,
    ConfigError,
    find_missing,
    get_by_path,
    merge,
    resolve_interpolations,
    set_by_path,
)
from mmlearn_tpu.conf.compose import compose
from mmlearn_tpu.conf.instantiate import instantiate, locate
from mmlearn_tpu.conf.store import (
    ConfigStore,
    builds,
    external_store,
    register_external_module,
    store,
)

__all__ = [
    "MISSING",
    "ConfigError",
    "ConfigStore",
    "JobType",
    "base_config",
    "builds",
    "compose",
    "external_store",
    "find_missing",
    "get_by_path",
    "instantiate",
    "locate",
    "merge",
    "register_external_module",
    "register_default_configs",
    "resolve_interpolations",
    "set_by_path",
    "store",
]


class JobType(str, enum.Enum):
    """Job dispatch type (reference: conf/__init__.py:46-50)."""

    train = "train"
    eval = "eval"
    # beyond reference: write serving artifacts (mmlearn_tpu.serving)
    export = "export"


def _dataloader_node() -> dict:
    from mmlearn_tpu.datasets.core.loader import DataLoader

    node = builds(DataLoader)
    node.pop("dataset", None)  # injected by the CLI, not configured
    node.pop("sampler", None)
    return node


def base_config() -> dict:
    """The base config schema every experiment composes on top of."""
    from mmlearn_tpu.trainer.trainer import Trainer

    trainer_node = builds(Trainer)
    trainer_node["callbacks"] = None
    trainer_node["loggers"] = None
    trainer_node["default_root_dir"] = "${runtime.output_dir}"

    return {
        "experiment_name": MISSING,
        "job_type": JobType.train.value,
        "seed": None,
        "datasets": {"train": None, "val": None, "test": None},
        "dataloader": {
            "train": _dataloader_node(),
            "val": _dataloader_node(),
            "test": _dataloader_node(),
        },
        "task": MISSING,
        "trainer": trainer_node,
        "tags": ["${experiment_name}"],
        "resume_from_checkpoint": None,
        "strict_loading": True,
        # initialize params from a reference (torch Lightning) .ckpt —
        # the migration path for half-trained reference runs
        # (mmlearn_tpu/lightning_import.py)
        "init_from_lightning": None,
        # job_type=export: serving-artifact settings (see docs/user_guide.md)
        "export": {
            # stablehlo (serving artifacts) | hf (torch-ecosystem state
            # dicts via mmlearn_tpu.hf_export — docs/migrating.md)
            "format": "stablehlo",
            "modalities": None,  # default: every modality in the batch
            "output_dir": "${runtime.output_dir}/artifacts",
            "normalize": True,
            "platforms": None,  # default: current backend
        },
        "runtime": {
            "output_dir": "outputs/${experiment_name}",
            "start_time": time.strftime("%Y-%m-%d_%H-%M-%S"),
        },
    }


_DEFAULTS_REGISTERED = False


def register_default_configs() -> None:
    """Register optax optimizers / schedules into the store (idempotent).

    Mirrors ``register_external_modules(torch.optim, ...)``
    (/root/reference/mmlearn/conf/__init__.py:247-377) but for optax: every
    optimizer factory becomes a ``zen_partial`` config in ``modules/optimizers``
    and every schedule factory in ``modules/lr_schedulers``.
    """
    global _DEFAULTS_REGISTERED
    if _DEFAULTS_REGISTERED:
        return
    _DEFAULTS_REGISTERED = True

    import optax

    for name in (
        "adam",
        "adamw",
        "sgd",
        "lamb",
        "lars",
        "lion",
        "adafactor",
        "adagrad",
        "rmsprop",
        "novograd",
        "adabelief",
    ):
        factory = getattr(optax, name, None)
        if factory is None:
            continue
        store.store_node(
            "modules/optimizers", name, builds(factory, zen_partial=True)
        )
    # Capitalized aliases matching the reference's torch.optim names so
    # experiment files written against the reference keep working.
    for ref_name, optax_name in (
        ("AdamW", "adamw"),
        ("Adam", "adam"),
        ("SGD", "sgd"),
        ("RMSprop", "rmsprop"),
    ):
        if store.has("modules/optimizers", optax_name):
            store.store_node(
                "modules/optimizers",
                ref_name,
                store.get("modules/optimizers", optax_name),
            )

    for name in (
        "cosine_decay_schedule",
        "warmup_cosine_decay_schedule",
        "exponential_decay",
        "linear_schedule",
        "constant_schedule",
        "cosine_onecycle_schedule",
        "linear_onecycle_schedule",
        "piecewise_constant_schedule",
    ):
        factory = getattr(optax, name, None)
        if factory is None:
            continue
        store.store_node(
            "modules/lr_schedulers", name, builds(factory, zen_partial=True)
        )


def check_missing(cfg: dict, allow: Sequence[str] = ()) -> None:
    """Raise with a readable message if required values are still ``???``."""
    missing = [m for m in find_missing(cfg) if m not in allow]
    if missing:
        raise ConfigError(
            "Missing required config values (set them in the experiment file "
            f"or via CLI overrides): {missing}"
        )
