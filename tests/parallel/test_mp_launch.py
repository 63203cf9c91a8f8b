"""run_workers must drain every worker's pipe concurrently.

A worker that writes more than one OS pipe buffer (~64 KB; JAX/XLA
warnings + training logs routinely exceed it) blocks in ``write()`` until
someone reads. If the launcher reads workers sequentially, a group whose
EARLIER worker waits on a LATER worker's progress (exactly what a
jax.distributed rendezvous does) deadlocks until the timeout.
"""

import sys

import pytest

from mmlearn_tpu.parallel.mp_launch import run_workers


def test_run_workers_drains_pipes_concurrently(tmp_path):
    flag = tmp_path / "flag"
    # worker 1: fill the pipe far past the buffer BEFORE signalling, then
    # signal worker 0 — it can only signal if the parent is draining
    w1 = (
        "import sys; sys.stdout.write('x' * 2_000_000); sys.stdout.flush(); "
        f"open({str(flag)!r}, 'w').close(); print('w1 done')"
    )
    # worker 0: wait for worker 1's signal (a stand-in for a collective)
    w0 = (
        "import os, time\n"
        f"while not os.path.exists({str(flag)!r}):\n"
        "    time.sleep(0.05)\n"
        "print('w0 done')"
    )
    outs = run_workers(
        [[sys.executable, "-c", w0], [sys.executable, "-c", w1]],
        timeout=60,
    )
    assert "w0 done" in outs[0]
    assert outs[1].endswith("w1 done\n") and len(outs[1]) > 2_000_000


def test_run_workers_failure_carries_tail():
    good = "print('fine')"
    bad = "import sys; print('about to fail'); sys.exit(3)"
    with pytest.raises(RuntimeError, match=r"rc=3(.|\n)*about to fail"):
        run_workers(
            [[sys.executable, "-c", good], [sys.executable, "-c", bad]],
            timeout=60,
        )


def test_run_workers_timeout_kills_group():
    hang = "import time; print('hanging'); time.sleep(600)"
    quick = "print('quick')"
    with pytest.raises(RuntimeError, match="timed out"):
        run_workers(
            [[sys.executable, "-c", hang], [sys.executable, "-c", quick]],
            timeout=3,
        )
