"""CLI flow tests: sampler wiring, dataloader config, multirun composition."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from mmlearn_tpu.cli._instantiators import (
    instantiate_dataloader,
    instantiate_datasets,
    instantiate_sampler,
)
from mmlearn_tpu.cli.run import build_experiment, run_sweep
from mmlearn_tpu.datasets.core import CombinedDataset
from mmlearn_tpu.datasets.core.samplers import CombinedDatasetRatioSampler


def test_sampler_from_config_node():
    """The registered sampler node wires through instantiate_sampler with
    injected dataset + rank/num_replicas (reference _instantiators.py:99-111)."""
    cfg = build_experiment(["experiment_name=t"])  # triggers registration
    from mmlearn_tpu.conf import store

    node = store.get("dataloader/sampler", "CombinedDatasetRatioSampler")
    node["ratios"] = [0.5, 0.5]
    node["num_samples"] = 16

    datasets_cfg = [
        {"_target_": "mmlearn_tpu.datasets.builtin.synthetic.SyntheticImages",
         "size": 16, "image_size": 8},
        {"_target_": "mmlearn_tpu.datasets.builtin.synthetic.SyntheticImages",
         "size": 16, "image_size": 8, "seed": 1},
    ]
    dataset = instantiate_datasets(datasets_cfg)
    assert isinstance(dataset, CombinedDataset)
    sampler = instantiate_sampler(node, dataset, rank=1, num_replicas=4)
    assert isinstance(sampler, CombinedDatasetRatioSampler)
    assert sampler.rank == 1 and sampler.num_replicas == 4
    assert len(list(sampler)) == 4  # 16 / 4 replicas

    loader = instantiate_dataloader(
        {"batch_size": 2, "drop_last": True}, dataset, sampler=sampler
    )
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["rgb"].shape == (2, 8, 8, 3)


def test_sampler_through_experiment_yaml(tmp_path):
    """dataloader.train.sampler in YAML reaches the DataLoader."""
    exp = tmp_path / "experiment"
    exp.mkdir()
    (exp / "sampler_exp.yaml").write_text(
        """
experiment_name: sampler_exp
datasets:
  train:
    _target_: mmlearn_tpu.datasets.builtin.synthetic.SyntheticImages
    size: 12
    image_size: 8
dataloader:
  train:
    batch_size: 4
    sampler:
      _target_: mmlearn_tpu.datasets.core.samplers.CombinedDatasetRatioSampler
      num_samples: 8
"""
    )
    cfg = build_experiment(
        [f"searchpath=[{tmp_path}]", "+experiment=sampler_exp"]
    )
    sampler_cfg = cfg["dataloader"]["train"]["sampler"]
    assert sampler_cfg["num_samples"] == 8
    dataset = instantiate_datasets(cfg["datasets"]["train"])
    sampler = instantiate_sampler(sampler_cfg, dataset, rank=0, num_replicas=1)
    loader = instantiate_dataloader(
        {k: v for k, v in cfg["dataloader"]["train"].items()
         if k != "sampler"},
        dataset, sampler=sampler,
    )
    assert len(loader) == 2  # 8 samples / batch 4


def test_multirun_cartesian_product():
    cfgs = run_sweep(
        ["experiment_name=sweep", "seed=1,2", "trainer.max_steps=3,4"],
        print_cfg=True,
    )
    assert len(cfgs) == 4
    combos = {(c["seed"], c["trainer"]["max_steps"]) for c in cfgs}
    assert combos == {(1, 3), (1, 4), (2, 3), (2, 4)}
    # output dirs are job-suffixed
    assert all(f"job{i}" in c["runtime"]["output_dir"]
               for i, c in enumerate(cfgs))


def test_launcher_arg_parsing():
    from mmlearn_tpu.cli.launcher import parse_launcher_args

    opts, rest = parse_launcher_args(
        ["launcher=slurm", "launcher.partition=tpu", "launcher.nodes=4",
         "trainer.max_steps=5,10", "+experiment=x"]
    )
    assert opts == {"kind": "slurm", "partition": "tpu", "nodes": "4"}
    assert rest == ["trainer.max_steps=5,10", "+experiment=x"]


def test_slurm_launcher_writes_scripts_and_submits(tmp_path):
    """submitit-style sbatch dispatch (reference default multirun path,
    conf/__init__.py:101-103) — scripts carry the job argv and directives."""
    from mmlearn_tpu.cli.launcher import launch_slurm

    # stub sbatch that records its argument
    sbatch = tmp_path / "sbatch"
    sbatch.write_text(
        "#!/bin/bash\necho submitted $1\ncat \"$1\" >> {}/calls.txt\n".format(
            tmp_path
        )
    )
    sbatch.chmod(0o755)

    outs = launch_slurm(
        [["a=1", "+experiment=foo"], ["a=2", "+experiment=foo"]],
        [str(tmp_path / "job0"), str(tmp_path / "job1")],
        sbatch=str(sbatch),
        partition="tpu", nodes=2, ntasks_per_node=1, multihost=True,
    )
    assert len(outs) == 2 and all(o.startswith("submitted") for o in outs)
    script = (tmp_path / "job0" / "submit.sh").read_text()
    assert "#SBATCH --partition=tpu" in script
    assert "#SBATCH --nodes=2" in script
    assert "#SBATCH --ntasks-per-node=1" in script
    assert "MMLEARN_MULTIHOST=1" in script
    assert "a=1" in script and "mmlearn_tpu.cli.run" in script
    calls = (tmp_path / "calls.txt").read_text()
    assert calls.count("srun") == 2


@pytest.mark.integration_test
def test_local_parallel_launcher(tmp_path):
    """launcher=local runs sweep jobs as concurrent subprocesses with
    per-job logs (each job gets a fresh JAX process)."""
    from mmlearn_tpu.cli.launcher import launch_local

    rcs = launch_local(
        [["--help"], ["--help"]],
        [str(tmp_path / "j0"), str(tmp_path / "j1")],
        workers=2,
        env={"MMLEARN_PLATFORM": "cpu"},
    )
    assert rcs == [0, 0]
    log = (tmp_path / "j0" / "job.log").read_text()
    assert "task" in log  # --help lists config groups
