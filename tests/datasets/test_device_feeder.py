"""DeviceFeeder: the productized input-fed pipeline (VERDICT r4 item 5).

Covers the behaviors the hand-rolled bench queues used to get wrong:
producer-exception surfacing, bounded waits instead of hangs, early-close
release, and the donated-buffer state threading hazard fixed in commit
bc479dc (a phase raising mid-measurement must leave the live state in the
caller's holder, never the already-donated originals).
"""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmlearn_tpu.datasets.core.loader import DeviceFeeder


def _batches(n, size=4):
    for i in range(n):
        yield {
            "x": np.full((size, 3), i, np.uint8),
            "i": np.asarray(i, np.int32),
        }


def test_yields_all_batches_in_order_with_normalize():
    def normalize(b):
        return {"x": b["x"].astype(jnp.float32) / 255.0, "i": b["i"]}

    with DeviceFeeder(_batches(5), normalize=normalize, prefetch=2) as feeder:
        seen = list(feeder)
    assert [int(b["i"]) for b in seen] == list(range(5))
    # normalize ran on device after placement
    assert seen[3]["x"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(seen[3]["x"]), 3 / 255.0, rtol=1e-6)


def test_producer_exception_surfaces():
    def bad_source():
        yield {"x": np.zeros(2)}
        raise RuntimeError("decode failed")

    with DeviceFeeder(bad_source()) as feeder:
        it = iter(feeder)
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            next(it)


def test_dead_source_times_out_instead_of_hanging():
    forever = threading.Event()

    def stalled_source():
        yield {"x": np.zeros(2)}
        forever.wait(60)  # simulates a wedged decoder/transport
        yield {"x": np.zeros(2)}

    feeder = DeviceFeeder(stalled_source(), timeout_s=0.5)
    try:
        it = iter(feeder)
        next(it)
        with pytest.raises(TimeoutError, match="no batch within"):
            next(it)
    finally:
        forever.set()
        feeder.close()


def test_early_close_releases_producer():
    produced = []

    def source():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2,), i)}

    feeder = DeviceFeeder(source(), prefetch=2)
    it = iter(feeder)
    next(it)
    feeder.close()
    n_at_close = len(produced)
    time.sleep(0.3)
    # the producer observed the stop flag: no unbounded production after
    # close, and the thread is gone
    assert len(produced) <= n_at_close + 2
    assert not feeder._thread.is_alive()


def test_feeder_holds_no_reference_to_yielded_batches():
    with DeviceFeeder(_batches(3), prefetch=1) as feeder:
        for _ in feeder:
            pass
        assert feeder._queue.qsize() == 0


def test_donation_safe_state_threading_mid_phase_failure():
    """The bc479dc hazard: a measurement phase drives a donating step and
    raises mid-way; the caller's next phase must get the LIVE buffers from
    the holder, and stepping again from them must work."""

    @jax.jit
    def add_one(params, batch):
        return params + batch["x"].sum(), params * 0

    step = jax.jit(
        lambda p, o, b, r: (p + b["x"].sum(), o, p.sum()),
        donate_argnums=(0, 1),
    )

    params = jnp.zeros((4,), jnp.float32)
    opt = jnp.zeros((4,), jnp.float32)
    state = [params, opt]

    def run_phase(state, n, fail_after=None):
        feeder = DeviceFeeder(
            ({"x": np.full((4,), 1, np.float32)} for _ in range(n))
        )
        with feeder:
            p, o = state
            for k, batch in enumerate(feeder):
                p, o, loss = step(p, o, batch, None)
                state[:] = [p, o]  # after EVERY call: phase may die next line
                if fail_after is not None and k + 1 == fail_after:
                    raise RuntimeError("phase died mid-measurement")

    with pytest.raises(RuntimeError, match="mid-measurement"):
        run_phase(state, n=5, fail_after=2)
    # the holder tracks the post-step buffers: 2 successful steps happened
    np.testing.assert_allclose(np.asarray(state[0]), 2 * 4.0)
    # phase 2 continues from the live buffers without use-after-free
    run_phase(state, n=3)
    np.testing.assert_allclose(np.asarray(state[0]), 5 * 4.0)
