"""Shared benchmark helpers.

Synchronization note: on tunneled PJRT platforms (axon) ``block_until_ready``
can return early — the only reliable fence is a device→host transfer, so all
timers here sync with ``float(...)`` on a scalar that depends on the full
computation chain (donated state makes the chain airtight).
"""

from __future__ import annotations

import time
from typing import Callable


def time_steps(step: Callable, n_warmup: int = 3, n_steps: int = 10):
    """Run ``step()`` (returns a scalar-able leaf) and report sec/step."""
    out = step()
    float(out)
    for _ in range(n_warmup - 1):
        out = step()
    float(out)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step()
    float(out)
    return (time.perf_counter() - t0) / n_steps
