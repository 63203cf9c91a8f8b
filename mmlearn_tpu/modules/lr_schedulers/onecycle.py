"""One-cycle LR schedule with exact torch ``OneCycleLR`` semantics.

Parity: ``torch.optim.lr_scheduler.OneCycleLR`` (three_phase=False), the
scheduler the reference's BIOSCAN-CLIP experiment trains with
(/root/reference/projects/bioscan_clip/configs/experiment/bioscan_1m.yaml:17,
74-80). ``optax.cosine_onecycle_schedule`` is NOT step-for-step compatible:
optax places the peak at ``pct_start * total_steps`` and the floor at
``total_steps``, while torch's phase boundaries are
``pct_start * total_steps - 1`` and ``total_steps - 1`` (torch
lr_scheduler.py ``_schedule_phases``), so every intermediate step differs.
This schedule reproduces torch's values exactly (verified per-step by
``tests/tasks/test_bioscan_trajectory.py`` against a recorded torch run).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from mmlearn_tpu.conf import store


@store(
    group="modules/lr_schedulers",
    name="onecycle_lr",
    zen_partial=True,
    populate_full_signature=False,
)
def onecycle_lr(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    anneal_strategy: str = "cos",
) -> optax.Schedule:
    """Two-phase one-cycle schedule, step-identical to torch's.

    Phase 1 anneals ``max_lr / div_factor → max_lr`` over steps
    ``[0, pct_start * total_steps - 1]``; phase 2 anneals
    ``max_lr → initial_lr / final_div_factor`` over the remainder, reaching
    the floor at step ``total_steps - 1``. ``anneal_strategy`` is ``"cos"``
    (``end + (start - end)/2 * (1 + cos(pi * pct))``) or ``"linear"``.
    """
    if anneal_strategy not in ("cos", "linear"):
        raise ValueError(
            f"anneal_strategy must be 'cos' or 'linear', got {anneal_strategy!r}"
        )
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps - 1)

    def _interp(start: float, end: float, pct: jnp.ndarray) -> jnp.ndarray:
        if anneal_strategy == "cos":
            return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))
        # convex form: exact at both endpoints in f32 — `start +
        # (end-start)*pct` cancels catastrophically at pct=1 when
        # end = start/1e4-style floors (4.8% relative error measured)
        return start * (1.0 - pct) + end * pct

    def schedule(count: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(count, jnp.float32)
        up_pct = jnp.clip(step / jnp.maximum(up_end, 1e-9), 0.0, 1.0)
        down_pct = jnp.clip(
            (step - up_end) / jnp.maximum(down_end - up_end, 1e-9), 0.0, 1.0
        )
        return jnp.where(
            step <= up_end,
            _interp(initial_lr, max_lr, up_pct),
            _interp(max_lr, min_lr, down_pct),
        )

    return schedule
