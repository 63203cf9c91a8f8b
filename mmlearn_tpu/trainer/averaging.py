"""Checkpoint weight averaging (model soups / SWA-style).

Averaging the params of several checkpoints from one run (or several
fine-tuning runs of the same architecture) is a standard cheap eval win
(Wortsman et al., "Model soups", ICML 2022; Izmailov et al., SWA). The
reference has no equivalent; here it operates directly on the Orbax
layout :class:`~mmlearn_tpu.trainer.callbacks.ModelCheckpoint` writes.

Only floating-point leaves under ``params`` (and, optionally, EMA trees in
``extras``) are averaged; everything else (step counter, optimizer state,
integer leaves) is taken from the LAST checkpoint so the result restores
like a normal checkpoint of that step.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _tree_mean(trees: Sequence[Any]) -> Any:
    """Mean of float leaves across structurally-identical trees; non-float
    leaves (ids, counters) come from the last tree."""
    import jax

    def _mean(*leaves):
        first = np.asarray(leaves[0])
        if not np.issubdtype(first.dtype, np.floating):
            return leaves[-1]
        # accumulate in f64 so bf16/f32 soups don't lose low bits, then
        # cast back to the stored dtype
        acc = np.zeros(first.shape, np.float64)
        for leaf in leaves:
            acc += np.asarray(leaf, np.float64)
        return (acc / len(leaves)).astype(first.dtype)

    return jax.tree.map(_mean, *trees)


def average_checkpoints(
    dirpath: str,
    steps: Optional[Sequence[int]] = None,
    average_extras: bool = False,
) -> Any:
    """Average the ``params`` of several checkpoints in one Orbax dir.

    Args:
        dirpath: a :class:`ModelCheckpoint` directory (the CheckpointManager
            root — e.g. ``<run>/checkpoints`` or ``<run>/checkpoints/best``).
        steps: which checkpoint steps to average; default = all on disk.
        average_extras: also average float leaves of ``extras`` (EMA
            teachers). Off by default — an EMA tree is already an average.

    Returns the last selected checkpoint's full tree with ``params``
    (and optionally ``extras``) replaced by the soup; restore it into a
    live state with ``flax.serialization.from_state_dict(trainer.state,
    soup)`` or save it as a new checkpoint.
    """
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(dirpath) as manager:
        available = sorted(manager.all_steps() or [])
        if steps is None:
            steps = available
        steps = sorted(int(s) for s in steps)
        if not steps:
            raise ValueError(f"No checkpoints found in {dirpath}")
        missing = [s for s in steps if s not in available]
        if missing:
            raise ValueError(
                f"Steps {missing} not in {dirpath} (available: {available})"
            )
        trees = [manager.restore(s) for s in steps]
    out = dict(trees[-1])
    out["params"] = _tree_mean([t["params"] for t in trees])
    if average_extras and trees[-1].get("extras") is not None:
        out["extras"] = _tree_mean([t["extras"] for t in trees])
    logger.info(
        "Averaged %d checkpoints from %s (steps %s)", len(steps), dirpath,
        steps,
    )
    return out
