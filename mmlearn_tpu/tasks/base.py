"""Training task base class.

Replaces the reference's ``TrainingTask(LightningModule)``
(/root/reference/mmlearn/tasks/base.py): a task owns Flax modules, a
(partial) optax optimizer + LR schedule, and a loss; it exposes *pure*
functions the Trainer jits:

- ``init_params(rng, sample_batch)`` → parameter pytree,
- ``loss_fn(params, batch, rng, extras)`` → ``(loss, (metrics, new_extras))``,
- ``post_update(params, extras)`` → updated aux state (EMA teachers, ...),
- ``prepare_batch(batch, step)`` → host-side per-step batch augmentation
  (e.g. I-JEPA mask generation — the reference generates masks on CPU inside
  the step, ijepa.py:223-229; here they must be arrays before device_put).

The decay/no-decay parameter split (reference base.py:93-117: weight decay
only for ndim≥2 params) is applied as an optax mask.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def decay_mask(params: Any) -> Any:
    """True (decayed) for params with ndim >= 2 (kernels/embeddings)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


class TrainingTask:
    """Base class for training tasks (see module docstring)."""

    def __init__(
        self,
        optimizer: Optional[Callable[..., optax.GradientTransformation]] = None,
        lr_scheduler: Optional[Callable[..., optax.Schedule]] = None,
        loss: Optional[Any] = None,
        compute_validation_loss: bool = True,
        compute_test_loss: bool = True,
    ) -> None:
        self.optimizer = optimizer
        self.lr_scheduler = lr_scheduler
        self.loss_fn_obj = loss
        self.compute_validation_loss = compute_validation_loss
        self.compute_test_loss = compute_test_loss
        self.evaluation_tasks: dict[str, Any] = {}
        #: optional callable(params) -> bool pytree (True = trainable);
        #: frozen params get optax.set_to_zero (no optimizer state)
        self.param_trainable_mask: Optional[Callable[[Any], Any]] = None

    # -- required overrides --------------------------------------------------
    def init_params(self, rng: jax.Array, sample_batch: Mapping[str, Any]) -> Any:
        raise NotImplementedError

    def loss_fn(
        self,
        params: Any,
        batch: Mapping[str, Any],
        rng: jax.Array,
        extras: Optional[Mapping[str, Any]] = None,
        deterministic: bool = False,
    ) -> tuple[jnp.ndarray, tuple[dict, Any]]:
        """Pure loss: ``(loss, (metrics, new_extras))``.

        The trainer always passes ``deterministic`` (False in train steps,
        True in val/test loss steps) — overrides must accept it.
        """
        raise NotImplementedError

    # -- optional overrides ---------------------------------------------------
    def init_extras(self, params: Any) -> Any:
        """Auxiliary (non-optimized) state carried in the TrainState."""
        return {}

    def post_update(self, params: Any, extras: Any, step: jnp.ndarray) -> Any:
        """Update aux state after the optimizer step (jit-safe). E.g. EMA."""
        return extras

    def prepare_batch(
        self, batch: dict[str, Any], step: int, training: bool = True
    ) -> dict[str, Any]:
        """Host-side per-step batch hook (mask generation etc.)."""
        return batch

    # -- optimizer construction ----------------------------------------------
    def configure_optimizers(
        self, max_steps: Optional[int] = None
    ) -> optax.GradientTransformation:
        """Build the optax transformation, resolving the LR schedule.

        Reference semantics (base.py:119-153): the partial optimizer is
        instantiated with the params, the partial scheduler with the
        optimizer. In optax, the schedule *is* the learning rate: we resolve
        the schedule partial (filling ``max_steps`` if its signature wants it
        and it wasn't configured) and pass it as ``learning_rate``.
        """
        if self.optimizer is None:
            return self._wrap_freeze(optax.adamw(1e-4, weight_decay=0.0))

        schedule = None
        if self.lr_scheduler is not None:
            sched_fn = self.lr_scheduler
            kwargs: dict[str, Any] = {}
            try:
                sig = inspect.signature(sched_fn)
                bound_kwargs = (
                    sched_fn.keywords if hasattr(sched_fn, "keywords") else {}
                )
                if (
                    "max_steps" in sig.parameters
                    and "max_steps" not in bound_kwargs
                    and max_steps is not None
                ):
                    kwargs["max_steps"] = max_steps
            except (TypeError, ValueError):
                pass
            schedule = sched_fn(**kwargs)
        self._resolved_schedule = schedule

        opt_kwargs: dict[str, Any] = {}
        if schedule is not None:
            opt_kwargs["learning_rate"] = schedule
        factory = self.optimizer
        try:
            sig = inspect.signature(factory)
            has_mask = "mask" in sig.parameters
            bound = factory.keywords if hasattr(factory, "keywords") else {}
            if has_mask and "mask" not in bound:
                wd = bound.get("weight_decay", None)
                if wd is None or wd != 0.0:
                    opt_kwargs["mask"] = decay_mask
        except (TypeError, ValueError):
            pass
        try:
            tx = factory(**opt_kwargs)
        except TypeError:
            opt_kwargs.pop("mask", None)
            tx = factory(**opt_kwargs)
        return self._wrap_freeze(tx)

    def _wrap_freeze(
        self, tx: optax.GradientTransformation
    ) -> optax.GradientTransformation:
        """Route frozen params to set_to_zero (the JAX requires_grad=False)."""
        if self.param_trainable_mask is None:
            return tx
        mask_fn = self.param_trainable_mask

        def labels(params: Any) -> Any:
            return jax.tree.map(
                lambda t: "trainable" if t else "frozen", mask_fn(params)
            )

        return optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, labels
        )

    # -- checkpoint hooks ------------------------------------------------------
    def on_checkpoint_save(self, state_dict: dict) -> dict:
        return state_dict

    def on_checkpoint_load(self, state_dict: dict) -> dict:
        return state_dict

    def apply_import_metadata(self, meta: dict) -> None:
        """Apply non-parameter state from an imported reference (Lightning)
        checkpoint — e.g. I-JEPA's EMA anneal position. Default: nothing to
        apply (parameters already arrive via ``init_overlay``)."""
