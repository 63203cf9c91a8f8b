"""Backend compiler options for the jitted steps.

``MMLEARN_COMPILER_OPTIONS`` is a JSON object of XLA backend flags (e.g.
``{"xla_tpu_scoped_vmem_limit_kib": "32768"}``) applied as per-compile
PJRT ``compiler_options`` to every step jit the framework creates
(train / val / bench / serving).

Why not ``XLA_FLAGS``: on tunneled backends the client process links a
CPU-only XLA whose flag parser aborts on unknown ``--xla_tpu_*`` flags
before any compile is attempted, while per-compile ``compiler_options``
are forwarded to the remote TPU compiler and validated *there*
(bogus names fail the remote compile; measured in docs/performance.md,
round-4 flag sweep). The reference exposes no equivalent knob — torch
users reach for env-var NCCL/cuBLAS tuning instead; this is the XLA
analogue.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Mapping

import jax

_ENV = "MMLEARN_COMPILER_OPTIONS"


def compiler_options_from_env() -> dict[str, Any] | None:
    """Parse ``MMLEARN_COMPILER_OPTIONS`` into a flag dict (or None).

    JSON value types are preserved — PJRT validates option values as
    typed (``false`` the JSON bool, not ``"false"`` the string).
    """
    raw = os.environ.get(_ENV)
    if not raw:
        return None
    opts = json.loads(raw)
    if not isinstance(opts, Mapping):
        raise ValueError(
            f"{_ENV} must be a JSON object of XLA flag -> value, got: {raw!r}"
        )
    return {str(k): v for k, v in opts.items()}


def step_jit(fn: Callable[..., Any], **jit_kwargs: Any) -> Any:
    """``jax.jit`` with the env-configured backend compiler options."""
    opts = compiler_options_from_env()
    if opts:
        jit_kwargs["compiler_options"] = opts
    return jax.jit(fn, **jit_kwargs)
