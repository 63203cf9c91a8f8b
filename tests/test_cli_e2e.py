"""End-to-end CLI runs of the shipped smoke experiments.

The reference's product surface is the ``mmlearn_run`` console script
(reference pyproject.toml:67 → mmlearn/cli/run.py:37-150); these tests drive
ours in-process (same 8-device CPU mesh the whole suite uses) through the
actual experiment YAMLs, asserting the training loop runs, logs, and learns.
"""

from __future__ import annotations

import json
import os

import pytest

from mmlearn_tpu.cli.run import main
from mmlearn_tpu.conf import ConfigError


def _read_metrics(output_dir: str) -> list[dict]:
    path = os.path.join(output_dir, "metrics.jsonl")
    assert os.path.exists(path), f"no metrics.jsonl in {output_dir}"
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_cli_tiny_clip_synthetic_trains(tmp_path):
    out = str(tmp_path / "clip")
    state = main([
        "+experiment=tiny_clip_synthetic",
        f"runtime.output_dir={out}",
    ])
    assert int(state.step) == 30
    rows = _read_metrics(out)
    losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert len(losses) >= 3
    # synthetic pairs are learnable: loss must drop decisively from init
    assert losses[-1] < losses[0] * 0.9, losses
    # validation ran (check_val_every_n_epoch=1) and logged a val loss
    assert any("validation/loss" in r for r in rows)


def test_cli_tiny_ijepa_synthetic_trains(tmp_path):
    out = str(tmp_path / "ijepa")
    state = main([
        "+experiment=tiny_ijepa_synthetic",
        f"runtime.output_dir={out}",
    ])
    assert int(state.step) == 20
    rows = _read_metrics(out)
    losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], losses


def test_cli_override_applies(tmp_path):
    out = str(tmp_path / "short")
    state = main([
        "+experiment=tiny_clip_synthetic",
        "trainer.max_steps=3",
        f"runtime.output_dir={out}",
    ])
    assert int(state.step) == 3


def test_cli_export_job(tmp_path):
    """job_type=export writes loadable serving artifacts for both towers."""
    out = str(tmp_path / "exp")
    paths = main([
        "+experiment=tiny_clip_synthetic",
        "job_type=export",
        f"runtime.output_dir={out}",
    ])
    assert set(paths) == {"rgb", "text"}
    from mmlearn_tpu.serving import load_encoder
    import numpy as np

    serve = load_encoder(paths["rgb"])
    emb = np.asarray(
        serve({"rgb": np.zeros((3, 32, 32, 3), np.float32)})
    )
    assert emb.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)


def test_cli_export_hf_format(tmp_path):
    """export.format=hf writes torch-loadable state dicts for every tower
    (docs/migrating.md 'Taking weights back to torch')."""
    out = str(tmp_path / "exp_hf")
    paths = main([
        "+experiment=tiny_clip_synthetic",
        "job_type=export",
        "export.format=hf",
        f"runtime.output_dir={out}",
    ])
    assert set(paths) == {"rgb", "text", "logit_scale"}
    import numpy as np

    # rgb tower: timm naming, with the sincos pos-emb materialized so the
    # exported model is the identical function
    npz = np.load(os.path.join(out, "artifacts", "rgb.hf.npz"))
    assert "blocks.0.attn.qkv.weight" in npz
    assert npz["pos_embed"].shape == (1, 17, 64)
    assert npz["head.weight"].shape == (32, 64)
    # text tower: HF CLIPTextModel naming
    npz = np.load(os.path.join(out, "artifacts", "text.hf.npz"))
    assert "text_model.encoder.layers.1.self_attn.q_proj.weight" in npz
    assert npz["text_projection.weight"].shape == (32, 64)
    try:
        import torch
    except ImportError:
        return
    sd = torch.load(paths["rgb"], weights_only=True)
    assert sd["cls_token"].shape == (1, 1, 64)


def test_cli_export_hf_format_ijepa(tmp_path):
    """The I-JEPA task exports encoder/predictor (+ EMA teacher) in the
    reference's own naming, loadable by the torch reference classes."""
    out = str(tmp_path / "exp_hf_ijepa")
    paths = main([
        "+experiment=tiny_ijepa_synthetic",
        "job_type=export",
        "export.format=hf",
        f"runtime.output_dir={out}",
    ])
    assert {"encoder", "predictor"} <= set(paths)
    import numpy as np

    npz = np.load(os.path.join(out, "artifacts", "encoder.hf.npz"))
    assert "blocks.0.mlp.0.weight" in npz  # reference Sequential-MLP naming
    npz = np.load(os.path.join(out, "artifacts", "predictor.hf.npz"))
    assert "predictor_blocks.0.attn.qkv.weight" in npz
    assert "mask_token" in npz


def test_cli_export_unknown_format():
    with pytest.raises(ConfigError, match="export.format"):
        main([
            "+experiment=tiny_clip_synthetic",
            "job_type=export",
            "export.format=onnx",
        ])


def test_cli_error_paths():
    with pytest.raises(ConfigError, match="experiment"):
        main(["+experiment=nope_does_not_exist"])
    with pytest.raises(ConfigError):
        main(["task=NoSuchTask"])
    with pytest.raises(ConfigError, match="[Mm]alformed"):
        main(["a_bare_word_is_not_an_override"])
