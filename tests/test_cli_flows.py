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
