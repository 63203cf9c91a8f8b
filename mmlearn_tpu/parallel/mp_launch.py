"""Local multi-process launch helpers (test/dryrun harness).

One implementation of the "fan out N ``jax.distributed`` workers on
localhost" pattern shared by the driver dry run
(``__graft_entry__._dryrun_multiprocess_stage``) and the multi-process
correctness tests (tests/parallel/test_multiprocess.py): pick a free
coordinator port, launch every worker with merged stdout/stderr, wait with
a timeout, kill stragglers, and surface the output tail of any failed
worker. Reference analogue: torchrun/Lightning spawn their DDP workers
(reference mmlearn/cli/run.py:72-77); JAX has no bundled local launcher.
"""

from __future__ import annotations

import socket
import subprocess
import threading
import time
from typing import Mapping, Optional, Sequence


def free_port() -> int:
    """An OS-assigned free TCP port on localhost (coordinator address)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_workers(
    cmds: Sequence[Sequence[str]],
    *,
    env: Optional[Mapping[str, str]] = None,
    cwd: Optional[str] = None,
    timeout: int = 600,
    tail: int = 40,
) -> list[str]:
    """Run every argv concurrently; return each worker's merged output.

    All workers are launched before any is waited on (they must rendezvous
    with each other through the jax.distributed coordinator, so sequential
    execution would deadlock), and every worker's pipe is drained by its
    own thread from launch — a worker that logs more than one pipe buffer
    (~64 KB of JAX/XLA/training output is routine) must never block on
    ``write()`` while the parent waits on a sibling. ``timeout`` is one
    shared deadline for the whole group, not per worker. A worker that
    exceeds it or exits nonzero raises RuntimeError carrying the last
    ``tail`` lines of its output; any still-running siblings are killed
    before the raise so a failed rendezvous can't leak orphan processes.
    """
    procs = [
        subprocess.Popen(
            list(cmd),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=dict(env) if env is not None else None,
            cwd=cwd,
        )
        for cmd in cmds
    ]
    outputs = [""] * len(procs)

    def _drain(i: int, p: subprocess.Popen) -> None:
        outputs[i] = p.stdout.read() or ""  # type: ignore[union-attr]

    threads = [
        threading.Thread(target=_drain, args=(i, p), daemon=True)
        for i, p in enumerate(procs)
    ]
    for t in threads:
        t.start()
    deadline = time.monotonic() + timeout
    timed_out: Optional[int] = None
    try:
        for idx, p in enumerate(procs):
            try:
                p.wait(timeout=max(0.1, deadline - time.monotonic()))
            except subprocess.TimeoutExpired:
                timed_out = idx
                break
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for t in threads:  # EOF after kill ends each drain thread
            t.join(timeout=30)
    if timed_out is not None:
        snippet = "\n".join(outputs[timed_out].splitlines()[-tail:])
        raise RuntimeError(
            f"worker {timed_out}/{len(procs)} timed out after {timeout}s:\n"
            f"{snippet}"
        )
    for idx, (p, out) in enumerate(zip(procs, outputs)):
        if p.returncode != 0:
            snippet = "\n".join(out.splitlines()[-tail:])
            raise RuntimeError(
                f"worker {idx}/{len(procs)} failed (rc={p.returncode}):\n"
                f"{snippet}"
            )
    return outputs
