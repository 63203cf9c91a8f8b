"""Multi-PROCESS correctness: 2 real jax.distributed processes × 4 devices.

Every ``jax.process_count() > 1`` branch in the repo is dead code under the
regular (single-process, 8-virtual-device) suite. These tests launch 2 REAL
processes (``jax.distributed.initialize`` with a localhost coordinator, 4
virtual CPU devices each — 8 global) running tests/parallel/mp_worker.py,
plus the identical scenario single-process, and assert the results agree.

This is the distributed story the reference gets exercised for free via
Lightning DDP (/root/reference/mmlearn/cli/run.py:72-77); here it proves:

- rank-strided sampler shards compose into the correct global batch
  (``jax.make_array_from_process_local_data`` assembly in shard_batch);
- training losses and final params match the single-process run exactly
  (the global per-step sample SETS are identical; the contrastive loss is
  permutation-invariant over the batch);
- eval metrics survive the per-process accumulation + ``process_allgather``
  merge with UNEQUAL shard sizes;
- embedding export writes disjoint per-process shards whose merged index
  covers the corpus exactly once;
- Orbax checkpoint save/resume coordinates across processes.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

from mmlearn_tpu.parallel.mp_launch import free_port, run_workers

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")
REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _run(scenario: str, nproc: int, outdir: str, timeout: int = 600) -> None:
    """Launch nproc workers, wait, fail with the tail of any dead worker
    (the shared harness also used by __graft_entry__'s multiprocess stage)."""
    port = str(free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # the workers pick their own device count / platform (mp_worker._bootstrap)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    try:
        run_workers(
            [
                [sys.executable, WORKER, scenario, str(pid), str(nproc), port,
                 outdir]
                for pid in range(nproc)
            ],
            env=env,
            cwd=REPO_ROOT,
            timeout=timeout,
        )
    except RuntimeError as err:
        pytest.fail(f"{scenario}: {err}")


@pytest.mark.slow
def test_fit_parity_two_processes(tmp_path):
    """2-process fit == 1-process fit: same per-step losses, same params."""
    mp_dir, sp_dir = str(tmp_path / "mp"), str(tmp_path / "sp")
    os.makedirs(mp_dir), os.makedirs(sp_dir)
    _run("fit", 2, mp_dir)
    _run("fit", 1, sp_dir)

    p0 = np.load(os.path.join(mp_dir, "fit_p0.npz"))
    p1 = np.load(os.path.join(mp_dir, "fit_p1.npz"))
    sp = np.load(os.path.join(sp_dir, "fit_p0.npz"))

    assert int(p0["step"]) == int(sp["step"]) == 6
    # both processes of one run observe the identical replicated state
    np.testing.assert_array_equal(p0["params"], p1["params"])
    np.testing.assert_array_equal(p0["losses"], p1["losses"])
    # vs single-process: same global sample set per step → same loss/grads
    # up to reduction-order rounding (different row layout on the mesh)
    np.testing.assert_allclose(p0["losses"], sp["losses"], rtol=2e-5, atol=1e-6)
    # measured rounding gap is ~3e-8 under SGD (see mp_worker.scenario_fit)
    np.testing.assert_allclose(p0["params"], sp["params"], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_retrieval_eval_two_processes(tmp_path):
    """Recall@K with per-process accumulation + process_allgather merge
    (unequal 27/26 shards) equals the single-process metric exactly."""
    mp_dir, sp_dir = str(tmp_path / "mp"), str(tmp_path / "sp")
    os.makedirs(mp_dir), os.makedirs(sp_dir)
    _run("eval", 2, mp_dir)
    _run("eval", 1, sp_dir)

    r0 = json.load(open(os.path.join(mp_dir, "eval_p0.json")))
    r1 = json.load(open(os.path.join(mp_dir, "eval_p1.json")))
    rs = json.load(open(os.path.join(sp_dir, "eval_p0.json")))
    keys = {"retrieval/rgb_to_text_R@1", "retrieval/rgb_to_text_R@5"}
    assert keys <= set(rs)
    for k in keys:
        assert r0[k] == pytest.approx(r1[k], abs=1e-9), k
        assert r0[k] == pytest.approx(rs[k], abs=1e-6), k


@pytest.mark.slow
def test_embedding_export_two_processes(tmp_path):
    """Per-process export shards merge into exactly-once corpus coverage."""
    sys.path.insert(0, REPO_ROOT)
    from mmlearn_tpu.serving.index import EmbeddingIndex

    outdir = str(tmp_path)
    _run("export", 2, outdir)

    index_dir = os.path.join(outdir, "index")
    manifests = sorted(
        f for f in os.listdir(index_dir) if f.startswith("manifest")
    )
    assert manifests == ["manifest_p0.json", "manifest_p1.json"]
    rows = [
        json.load(open(os.path.join(index_dir, m)))["rgb"]["rows"]
        for m in manifests
    ]
    assert sorted(rows) == [26, 27]  # unpadded eval shards of 53

    index = EmbeddingIndex.load(index_dir, "rgb")
    assert len(index) == 53
    assert sorted(index.example_index.tolist()) == list(range(53))
    # self-retrieval sanity on the merged index: every embedding's own
    # nearest neighbor is itself
    hits, ex = index.query(np.asarray(index.embeddings), k=1)
    assert (np.asarray(ex).reshape(-1) == index.example_index).all()


@pytest.mark.slow
def test_checkpoint_resume_two_processes(tmp_path):
    """Orbax save/restore with both processes participating: straight 4-step
    params == 2-step + resume params."""
    outdir = str(tmp_path)
    _run("ckpt", 2, outdir)
    for pid in range(2):
        z = np.load(os.path.join(outdir, f"ckpt_p{pid}.npz"))
        np.testing.assert_allclose(
            z["straight"], z["resumed"], rtol=1e-6, atol=1e-8
        )


@pytest.mark.slow
def test_world_size_change_resume(tmp_path):
    """VERDICT r4 item 7: an Orbax checkpoint written by a 2-process run
    restores into a 1-process run AND vice versa, continuing training to
    the same params as an uninterrupted fit (the torch reference gets this
    free from process-count-agnostic .ckpt files)."""
    # 2-process save → 1-process resume
    a = str(tmp_path / "two_to_one")
    os.makedirs(a)
    _run("reshard_save", 2, a)
    _run("reshard_resume", 1, a)
    r = np.load(os.path.join(a, "reshard_resume_p0.npz"))
    np.testing.assert_allclose(
        r["resumed"], r["straight"], rtol=1e-5, atol=1e-6
    )

    # 1-process save → 2-process resume
    b = str(tmp_path / "one_to_two")
    os.makedirs(b)
    _run("reshard_save", 1, b)
    _run("reshard_resume", 2, b)
    r0 = np.load(os.path.join(b, "reshard_resume_p0.npz"))
    r1 = np.load(os.path.join(b, "reshard_resume_p1.npz"))
    # both processes observe the identical restored-and-trained state
    np.testing.assert_array_equal(r0["resumed"], r1["resumed"])
    np.testing.assert_allclose(
        r0["resumed"], r0["straight"], rtol=1e-5, atol=1e-6
    )
