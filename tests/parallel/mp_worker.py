"""Multi-process worker: one REAL ``jax.distributed`` process of a 2-process run.

This is the executable half of the multi-process correctness harness
(tests/parallel/test_multiprocess.py). Each scenario exercises code paths
that are dead under single-process tests — everything guarded by
``jax.process_count() > 1``:

- global-batch assembly via ``jax.make_array_from_process_local_data``
  (parallel/mesh.py shard_batch);
- rank-strided sampler disjointness composing into a correct global batch
  (reference DDP rank semantics, /root/reference/mmlearn/cli/run.py:72-77 and
  datasets/core/samplers.py:230);
- ``process_allgather`` metric gathers (modules/metrics/retrieval_recall.py);
- per-process embedding-export shards + manifest merge
  (tasks/embedding_export.py);
- Orbax checkpoint save/restore coordination across processes.

Run as:  python tests/parallel/mp_worker.py <scenario> <pid> <nproc> <port> <outdir>

With ``nproc=1`` the worker runs the identical scenario single-process on
8 virtual devices — the parity comparator.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _bootstrap(pid: int, nproc: int, port: str) -> None:
    """Force the CPU platform with 8/nproc local devices, join the cluster."""
    sys.path.insert(0, REPO_ROOT)
    local_devices = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    assert len(jax.devices()) == 8, "scenarios assume 8 global devices"


def _tiny_task(with_eval: object = None):
    from __graft_entry__ import _flagship_task

    task = _flagship_task(tiny=True)
    if with_eval is not None:
        task.evaluation_tasks = with_eval
    return task


def _train_loader(nproc: int, global_batch: int = 32, size: int = 64):
    from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
    from mmlearn_tpu.datasets.core.samplers import CombinedDatasetRatioSampler
    from mmlearn_tpu.datasets.builtin.synthetic import SyntheticImageText

    ds = CombinedDataset(
        [SyntheticImageText(size=size, image_size=32, seq_len=16, vocab_size=64)]
    )
    sampler = CombinedDatasetRatioSampler(
        ds, shuffle=True, seed=0, drop_last=True
    )  # rank/num_replicas default to jax.process_index()/process_count()
    return DataLoader(
        ds, batch_size=global_batch // nproc, sampler=sampler, drop_last=True
    )


def _eval_loader(nproc: int, size: int = 53, global_batch: int = 16):
    """Unpadded distributed eval: process shards of UNEQUAL size (53 rows
    over 2 processes → 27/26), padded per batch with a validity mask."""
    from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
    from mmlearn_tpu.datasets.core.samplers import DistributedEvalSampler
    from mmlearn_tpu.datasets.builtin.synthetic import SyntheticImageText

    ds = CombinedDataset(
        [SyntheticImageText(size=size, image_size=32, seq_len=16, vocab_size=64)]
    )
    sampler = DistributedEvalSampler(ds)
    return DataLoader(
        ds,
        batch_size=global_batch // nproc,
        sampler=sampler,
        pad_partial_batches=True,
    )


class _CaptureMetrics:
    """Callback recording the per-step host metrics the trainer logs."""

    def __init__(self) -> None:
        self.losses: list[float] = []

    def on_train_start(self, trainer) -> None: ...

    def on_train_batch_end(self, trainer, metrics, step) -> None:
        if "loss" in metrics:
            self.losses.append(float(metrics["loss"]))

    def on_train_epoch_end(self, trainer, epoch) -> None: ...

    def on_validation_end(self, trainer, metrics, step) -> None: ...

    def on_train_end(self, trainer) -> None: ...


def _flat_params(params) -> "np.ndarray":
    import jax
    import numpy as np

    host = jax.device_get(params)
    return np.concatenate(
        [np.ravel(np.asarray(x, np.float64)) for x in jax.tree.leaves(host)]
    )


def scenario_fit(outdir: str, pid: int, nproc: int) -> None:
    """Short contrastive fit; asserts loss/params equal across launches."""
    import functools

    import numpy as np
    import optax

    from mmlearn_tpu.trainer import Trainer

    task = _tiny_task()
    # SGD for the parity check: its update is LINEAR in the gradient, so the
    # ~1e-7 reduction-order rounding between batch layouts stays ~1e-6 in
    # params. (AdamW's m/(sqrt(v)+eps) is sign-like for near-zero grads —
    # a rounding flip there moves a param by a full lr step, which would
    # make exact cross-layout parity unassertable, not incorrect.)
    task.optimizer = functools.partial(optax.sgd, momentum=0.9)
    loader = _train_loader(nproc)
    capture = _CaptureMetrics()
    trainer = Trainer(
        max_steps=6,
        log_every_n_steps=1,
        mesh_shape={"data": 8},
        default_root_dir=os.path.join(outdir, f"root_p{pid}"),
        callbacks=[capture],
        seed=0,
    )
    state = trainer.fit(task, loader)
    np.savez(
        os.path.join(outdir, f"fit_p{pid}.npz"),
        losses=np.asarray(capture.losses),
        params=_flat_params(state.params),
        step=int(state.step),
    )


def scenario_eval(outdir: str, pid: int, nproc: int) -> None:
    """Zero-shot retrieval eval: per-process accumulation, one
    ``process_allgather`` merge at compute (unequal shard sizes)."""
    import json

    from mmlearn_tpu.tasks.contrastive_pretraining import EvaluationSpec
    from mmlearn_tpu.tasks.zero_shot_retrieval import (
        RetrievalTaskSpec,
        ZeroShotCrossModalRetrieval,
    )
    from mmlearn_tpu.trainer import Trainer

    retrieval = ZeroShotCrossModalRetrieval(
        [RetrievalTaskSpec(query_modality="rgb", target_modality="text", top_k=[1, 5])]
    )
    task = _tiny_task({"retrieval": EvaluationSpec(task=retrieval)})
    task.compute_validation_loss = False
    loader = _eval_loader(nproc)
    trainer = Trainer(
        mesh_shape={"data": 8},
        default_root_dir=os.path.join(outdir, f"root_p{pid}"),
        seed=0,
    )
    trainer.prepare_eval_state(task, loader)
    results = trainer.validate(task, loader)
    with open(os.path.join(outdir, f"eval_p{pid}.json"), "w") as f:
        json.dump(results, f)


def scenario_export(outdir: str, pid: int, nproc: int) -> None:
    """Embedding export: disjoint per-process shards + per-process manifests
    (merged and deduped by EmbeddingIndex.load in the parent test)."""
    import json

    from mmlearn_tpu.tasks.contrastive_pretraining import EvaluationSpec
    from mmlearn_tpu.tasks.embedding_export import EmbeddingExport
    from mmlearn_tpu.trainer import Trainer

    export = EmbeddingExport(
        output_dir=os.path.join(outdir, "index"),
        modalities=["rgb"],
        shard_size=24,  # force multiple shards per process
    )
    task = _tiny_task({"export": EvaluationSpec(task=export)})
    task.compute_validation_loss = False
    loader = _eval_loader(nproc)
    trainer = Trainer(
        mesh_shape={"data": 8},
        default_root_dir=os.path.join(outdir, f"root_p{pid}"),
        seed=0,
    )
    trainer.prepare_eval_state(task, loader)
    results = trainer.validate(task, loader)
    with open(os.path.join(outdir, f"export_p{pid}.json"), "w") as f:
        json.dump(results, f)


def scenario_ckpt(outdir: str, pid: int, nproc: int) -> None:
    """Checkpoint/resume under multi-process Orbax coordination.

    A straight 4-step fit and a 2-step fit + resume-to-4 must produce
    identical params; the save/restore happens with every process
    participating (Orbax multihost protocol)."""
    import numpy as np

    from mmlearn_tpu.trainer import Trainer
    from mmlearn_tpu.trainer.callbacks import ModelCheckpoint

    ckpt_dir = os.path.join(outdir, "ckpt")

    def _fit(max_steps, with_ckpt, resume):
        task = _tiny_task()
        loader = _train_loader(nproc)
        callbacks = []
        if with_ckpt:
            callbacks.append(
                ModelCheckpoint(
                    dirpath=ckpt_dir, save_last=True, async_save=False
                )
            )
        trainer = Trainer(
            max_steps=max_steps,
            log_every_n_steps=1,
            mesh_shape={"data": 8},
            default_root_dir=os.path.join(outdir, f"root_p{pid}"),
            callbacks=callbacks,
            seed=0,
        )
        return trainer.fit(
            task, loader, ckpt_path=ckpt_dir if resume else None
        )

    straight = _fit(4, with_ckpt=False, resume=False)
    _fit(2, with_ckpt=True, resume=False)
    resumed = _fit(4, with_ckpt=True, resume=True)
    assert int(resumed.step) == 4, int(resumed.step)
    np.savez(
        os.path.join(outdir, f"ckpt_p{pid}.npz"),
        straight=_flat_params(straight.params),
        resumed=_flat_params(resumed.params),
    )


def _sgd_task():
    """SGD variant for cross-topology parity (linear in the gradient — see
    scenario_fit's note on why AdamW makes rounding unassertable)."""
    import functools

    import optax

    task = _tiny_task()
    task.optimizer = functools.partial(optax.sgd, momentum=0.9)
    return task


def scenario_reshard_save(outdir: str, pid: int, nproc: int) -> None:
    """First half of the WORLD-SIZE-CHANGE resume scenario (VERDICT r4
    item 7): fit 2 steps under THIS topology and save; the other topology
    restores it (the torch reference gets cross-world-size restore free
    from process-count-agnostic .ckpt files — here Orbax must do it)."""
    import numpy as np

    from mmlearn_tpu.trainer import Trainer
    from mmlearn_tpu.trainer.callbacks import ModelCheckpoint

    trainer = Trainer(
        max_steps=2,
        log_every_n_steps=1,
        mesh_shape={"data": 8},
        default_root_dir=os.path.join(outdir, f"save_root_p{pid}"),
        callbacks=[
            ModelCheckpoint(
                dirpath=os.path.join(outdir, "ckpt"),
                save_last=True,
                async_save=False,
            )
        ],
        seed=0,
    )
    state = trainer.fit(_sgd_task(), _train_loader(nproc))
    np.savez(
        os.path.join(outdir, f"reshard_save_p{pid}.npz"),
        params=_flat_params(state.params),
    )


def scenario_reshard_resume(outdir: str, pid: int, nproc: int) -> None:
    """Second half: restore the checkpoint written by the OTHER topology,
    continue to step 4, and compare against an uninterrupted 4-step fit in
    this topology (same seed/data order → identical up to reduction-order
    rounding)."""
    import numpy as np

    from mmlearn_tpu.trainer import Trainer

    def _trainer():
        return Trainer(
            max_steps=4,
            log_every_n_steps=1,
            mesh_shape={"data": 8},
            default_root_dir=os.path.join(outdir, f"resume_root_p{pid}"),
            seed=0,
        )

    resumed = _trainer().fit(
        _sgd_task(), _train_loader(nproc),
        ckpt_path=os.path.join(outdir, "ckpt"),
    )
    assert int(resumed.step) == 4, int(resumed.step)
    straight = _trainer().fit(_sgd_task(), _train_loader(nproc))
    np.savez(
        os.path.join(outdir, f"reshard_resume_p{pid}.npz"),
        resumed=_flat_params(resumed.params),
        straight=_flat_params(straight.params),
    )


SCENARIOS = {
    "fit": scenario_fit,
    "eval": scenario_eval,
    "export": scenario_export,
    "ckpt": scenario_ckpt,
    "reshard_save": scenario_reshard_save,
    "reshard_resume": scenario_reshard_resume,
}


def main() -> None:
    scenario, pid, nproc, port, outdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
        sys.argv[5],
    )
    _bootstrap(pid, nproc, port)
    SCENARIOS[scenario](outdir, pid, nproc)
    print(f"mp_worker {scenario} p{pid}/{nproc} OK", flush=True)


if __name__ == "__main__":
    main()
