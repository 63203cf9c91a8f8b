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


class _StreamingMean:
    """Running mean over structurally-identical trees, one tree at a time.

    Float leaves accumulate in f64 (so bf16/f32 soups don't lose low bits)
    and are cast back to the first tree's stored dtype; non-float leaves
    (ids, counters) take the LAST tree's value. Streaming keeps peak host
    memory at ~2x one checkpoint instead of Nx for an N-checkpoint soup.
    """

    def __init__(self) -> None:
        self._acc: Any = None
        self._last: Any = None
        self._dtypes: Any = None
        self._count = 0

    def update(self, tree: Any) -> None:
        import jax

        def _to_acc(leaf):
            a = np.asarray(leaf)
            return (
                a.astype(np.float64)
                if np.issubdtype(a.dtype, np.floating)
                else None
            )

        if self._acc is None:
            self._acc = jax.tree.map(_to_acc, tree)
            self._dtypes = jax.tree.map(lambda l: np.asarray(l).dtype, tree)
        else:
            self._acc = jax.tree.map(
                lambda acc, leaf: None
                if acc is None
                else acc + np.asarray(leaf, np.float64),
                self._acc,
                tree,
                is_leaf=lambda x: x is None,
            )
        self._last = tree
        self._count += 1

    def result(self) -> Any:
        import jax

        return jax.tree.map(
            lambda acc, last, dt: np.asarray(last)
            if acc is None
            else (acc / self._count).astype(dt),
            self._acc,
            self._last,
            self._dtypes,
            is_leaf=lambda x: x is None,
        )


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
        # stream one checkpoint at a time: peak host memory stays ~2x one
        # checkpoint regardless of soup size
        params_mean = _StreamingMean()
        extras_mean = _StreamingMean()
        last = None
        for s in steps:
            last = manager.restore(s)
            params_mean.update(last["params"])
            if average_extras and last.get("extras") is not None:
                extras_mean.update(last["extras"])
    out = dict(last)
    out["params"] = params_mean.result()
    if average_extras and last.get("extras") is not None:
        out["extras"] = extras_mean.result()
    logger.info(
        "Averaged %d checkpoints from %s (steps %s)", len(steps), dirpath,
        steps,
    )
    return out
