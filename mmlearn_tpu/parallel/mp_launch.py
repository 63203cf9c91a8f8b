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
    execution would deadlock). A worker that exceeds ``timeout`` or exits
    nonzero raises RuntimeError carrying the last ``tail`` lines of its
    output; any still-running siblings are killed before the raise so a
    failed rendezvous can't leak orphan processes.
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
    outputs: list[str] = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outputs.append(out or "")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for idx, (p, out) in enumerate(zip(procs, outputs)):
        if p.returncode != 0:
            snippet = "\n".join(out.splitlines()[-tail:])
            raise RuntimeError(
                f"worker {idx}/{len(procs)} failed (rc={p.returncode}):\n"
                f"{snippet}"
            )
    return outputs
