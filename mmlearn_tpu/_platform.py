"""Platform forcing shared by the CLI and benchmark scripts.

Some TPU PJRT plugins (e.g. the tunneled ``axon`` backend) ignore the
``JAX_PLATFORMS`` env var, so "run this on CPU" must go through
``jax.config``. ``MMLEARN_PLATFORM=cpu`` is the framework-wide knob; call
this before the first backend touch.
"""

from __future__ import annotations

import os


def force_platform_from_env() -> None:
    """Apply ``MMLEARN_PLATFORM`` (if set) via ``jax.config``."""
    platform = os.environ.get("MMLEARN_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
