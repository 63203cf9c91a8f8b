"""Project-level tests: config composition + BIOSCAN pipeline on tiny HDF5."""

import functools
import io
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")  # projects package lives at repo root

from mmlearn_tpu.cli.run import build_experiment
from mmlearn_tpu.conf import instantiate


def test_compose_ijepa_project():
    cfg = build_experiment(
        [
            "searchpath=[pkg://projects.ijepa.configs]",
            "+experiment=in1k_vit_small",
        ]
    )
    assert cfg["task"]["_target_"].endswith("IJEPA")
    assert cfg["task"]["encoder"]["_target_"].endswith("vit_small")
    assert cfg["trainer"]["max_epochs"] == 100


def test_compose_med_benchmarking_project():
    cfg = build_experiment(
        [
            "searchpath=[pkg://projects.med_benchmarking.configs]",
            "+experiment=baseline",
        ]
    )
    assert len(cfg["datasets"]["train"]) == 4
    task = cfg["task"]
    assert task["_target_"].endswith("ContrastivePretraining")
    # the task (with its eval specs) must instantiate without touching data
    obj = instantiate(task)
    assert "retrieval" in obj.evaluation_tasks


def test_compose_multi_task_project():
    cfg = build_experiment(
        [
            "searchpath=[pkg://projects.multi_task.configs]",
            "+experiment=contrastive_ijepa",
        ]
    )
    assert "ijepa_rgb" in cfg["task"]["auxiliary_tasks"]


def test_compose_bioscan_project(monkeypatch):
    monkeypatch.setenv("BIOSCAN_1M_HDF5", "/tmp/fake.hdf5")
    cfg = build_experiment(
        [
            "searchpath=[pkg://projects.bioscan_clip.configs]",
            "+experiment=bioscan_1m",
        ]
    )
    assert cfg["task"]["peft_configs"]["rgb"]["r"] == 4
    assert len(cfg["task"]["modality_loss_pairs"]) == 3
    # the full trimodal task (timm-style ViT + BERT-small + BarcodeBERT,
    # LoRA on all three towers, taxonomic eval) must instantiate without
    # touching data
    task = instantiate(cfg["task"])
    assert set(task.encoders) == {"rgb", "text", "dna"}
    assert set(task.peft_configs) == {"rgb", "text", "dna"}
    assert "taxonomic" in task.evaluation_tasks


def test_dna_tokenizer():
    from projects.bioscan_clip.dna_tokenizer import DNAProcessor

    proc = DNAProcessor(max_length=20, kmers=5, stride=5)
    ids = proc("ACGTACGTACGTACGTACGT")
    assert ids.shape == (proc.seq_length,)
    assert ids[0] == proc.cls_id
    assert (ids[1:] != proc.unk_id).all()
    # unknown bases → UNK; short sequences are N-padded (→ UNK kmers)
    ids2 = proc("ACGTN")
    assert ids2[1] == proc.unk_id or ids2[2] == proc.unk_id
    assert ids2.shape == ids.shape


def test_dna_tokenizer_matches_reference():
    """Differential: our dict-lookup tokenizer produces the exact ids of the
    reference's HF `tokenizers` WordLevel pipeline
    (/root/reference/projects/bioscan_clip/dna_tokenizer.py) on real-shaped
    barcodes — same vocab order, CLS prepend, N-pad → UNK kmers, trim."""
    pytest.importorskip("tokenizers")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_dna_tokenizer",
        "/root/reference/projects/bioscan_clip/dna_tokenizer.py",
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    from projects.bioscan_clip.dna_tokenizer import DNAProcessor

    rng = np.random.default_rng(7)
    ours = DNAProcessor(max_length=60, kmers=5, stride=5)
    ref = ref_mod.DNAProcessor(max_length=60, kmers=5, stride=5)
    cases = [
        "".join(rng.choice(list("ACGT"), 60)),      # exact length
        "".join(rng.choice(list("ACGT"), 80)),      # trimmed
        "".join(rng.choice(list("ACGT"), 23)),      # N-padded → UNK kmers
        "".join(rng.choice(list("ACGTN"), 60)),     # ambiguous bases
        "",                                          # all padding
    ]
    for seq in cases:
        np.testing.assert_array_equal(
            ours(seq), np.asarray(ref(seq)), err_msg=repr(seq[:12])
        )
    assert ours.vocab_size == ref.tokenizer.vocab_size


def _make_bioscan_h5(path, splits, n_per_split=8, seed=0):
    import h5py
    from PIL import Image

    rng = np.random.default_rng(seed)
    orders = ["Diptera", "Hymenoptera"]
    with h5py.File(path, "w") as f:
        for split in splits:
            g = f.create_group(split)
            enc_images = []
            lengths = []
            for i in range(n_per_split):
                arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                enc_images.append(np.frombuffer(buf.getvalue(), np.uint8))
                lengths.append(len(enc_images[-1]))
            max_len = max(lengths)
            padded = np.zeros((n_per_split, max_len), np.uint8)
            for i, e in enumerate(enc_images):
                padded[i, : len(e)] = e
            g.create_dataset("image", data=padded)
            g.create_dataset("image_mask", data=np.asarray(lengths))
            barcodes = [
                "".join(rng.choice(list("ACGT"), 60)) for _ in range(n_per_split)
            ]
            g.create_dataset(
                "barcode", data=np.asarray([b.encode() for b in barcodes])
            )
            g.create_dataset(
                "image_file",
                data=np.asarray([f"{split}_{i}".encode() for i in range(n_per_split)]),
            )
            ids = rng.integers(2, 50, (n_per_split, 12)).astype(np.int32)
            g.create_dataset("language_tokens_input_ids", data=ids)
            g.create_dataset(
                "language_tokens_token_type_ids", data=np.zeros_like(ids)
            )
            g.create_dataset(
                "language_tokens_attention_mask", data=np.ones_like(ids)
            )
            for level in ("order", "family", "genus", "species"):
                vals = [
                    orders[i % 2].encode() if level == "order"
                    else f"{level}_{i % 2}".encode()
                    for i in range(n_per_split)
                ]
                g.create_dataset(level, data=np.asarray(vals))


@pytest.mark.integration_test
def test_bioscan_dataset_and_taxonomic_eval(tmp_path):
    import optax

    from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
    from mmlearn_tpu.modules.encoders import TextTransformer, VisionTransformer
    from mmlearn_tpu.tasks import ContrastivePretraining, EvaluationSpec
    from mmlearn_tpu.trainer import Trainer
    from projects.bioscan_clip.dataset import BIOSCANInsectDataset
    from projects.bioscan_clip.dna_tokenizer import DNAProcessor
    from projects.bioscan_clip.encoders import BarcodeBERT
    from projects.bioscan_clip.eval_task import TaxonomicClassification

    h5_path = str(tmp_path / "bioscan_tiny.hdf5")
    _make_bioscan_h5(
        h5_path, ["train_seen", "all_keys", "val_seen", "val_unseen"]
    )

    proc = DNAProcessor(max_length=60, kmers=5, stride=5)
    train_ds = BIOSCANInsectDataset(
        h5_path, split="train_seen", dna_processor=proc, for_training=True,
        image_size=32,
    )
    ex = train_ds[0]
    assert ex["rgb"].shape == (32, 32, 3)
    assert ex["dna"].shape == (proc.seq_length,)
    assert isinstance(ex["process_id"], str)

    encoders = {
        "rgb": VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                                 depth=1, num_heads=4, global_pool="avg",
                                 proj_dim=16),
        "dna": BarcodeBERT(vocab_size=proc.vocab_size, projection_dim=16,
                           embed_dim=32, depth=1, num_heads=4,
                           max_length=proc.seq_length),
        "text": TextTransformer(vocab_size=64, max_length=12, embed_dim=32,
                                depth=1, num_heads=4, causal=False,
                                pooling="mean", proj_dim=16),
    }
    task = ContrastivePretraining(
        encoders=encoders,
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3,
                                    weight_decay=0.0),
        evaluation_tasks={
            "taxonomic": EvaluationSpec(task=TaxonomicClassification(top_k=[1]))
        },
    )
    train_loader = DataLoader(
        CombinedDataset([train_ds]), batch_size=8, drop_last=True
    )
    eval_sets = [
        BIOSCANInsectDataset(h5_path, split=s, dna_processor=proc,
                             for_training=False, image_size=32)
        for s in ("all_keys", "val_seen", "val_unseen")
    ]
    val_loader = DataLoader(
        CombinedDataset(eval_sets), batch_size=8, pad_partial_batches=True
    )
    trainer = Trainer(max_steps=2, log_every_n_steps=1, seed=0,
                      default_root_dir=str(tmp_path))
    trainer.fit(task, train_loader)
    results = trainer.validate(task, val_loader)
    assert "val_seen_rgb_2_dna_top_1_micro_order" in results
    assert "val_unseen_rgb_2_dna_top_1_macro_species" in results
    for v in results.values():
        assert 0.0 <= v <= 1.0 or np.isfinite(v)


def test_taxonomic_merge_stores():
    """Multihost store merge keeps per-split key lists in process order."""
    from projects.bioscan_clip.eval_task import _merge_stores

    s0 = {"all_keys": {"rgb": [np.ones((2, 4))], "labels": [{"order": "a"}]}}
    s1 = {
        "all_keys": {"rgb": [np.zeros((1, 4))], "labels": [{"order": "b"}]},
        "val_seen": {"rgb": [np.full((1, 4), 2.0)], "labels": [{"order": "c"}]},
    }
    merged = _merge_stores([s0, s1])
    assert [a.shape for a in merged["all_keys"]["rgb"]] == [(2, 4), (1, 4)]
    assert merged["all_keys"]["labels"] == [{"order": "a"}, {"order": "b"}]
    assert "val_seen" in merged


def _write_png(path, size=40, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(str(path))


def test_med_csv_classification_ham10000(tmp_path):
    """CSVImageClassification path: metadata CSV + extensionless image ids
    (reference projects/med_benchmarking/datasets/ham10000.py)."""
    from projects.med_benchmarking.datasets.classification import HAM10000

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rows = ["image_id,dx"]
    for i, dx in enumerate(["nv", "mel", "bkl"]):
        _write_png(img_dir / f"im{i}.jpg", seed=i)
        rows.append(f"im{i},{dx}")
    (tmp_path / "HAM10000_metadata.csv").write_text("\n".join(rows))

    ds = HAM10000(root_dir=str(tmp_path), image_size=32)
    assert len(ds) == 3
    ex = ds[1]
    assert ex["rgb"].shape == (32, 32, 3) and ex["rgb"].dtype == np.float32
    assert ex["rgb_target"] == 1  # mel
    assert ds.id2label[1] == "Melanoma"
    assert any("dermoscopic" in t for t in ds.zero_shot_prompt_templates)


def test_med_image_text_manifest_pmcoa(tmp_path):
    """ImageTextManifest jsonl path (reference pmcoa.py manifest layout)."""
    import json as _json

    from projects.med_benchmarking.datasets.image_text import PMCOA

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    lines = []
    for i in range(3):
        _write_png(img_dir / f"fig{i}.png", seed=10 + i)
        lines.append(_json.dumps(
            {"image": f"fig{i}.png", "caption": f"figure number {i}"}
        ))
    (tmp_path / "train.jsonl").write_text("\n".join(lines))

    ds = PMCOA(root_dir=str(tmp_path), image_size=32)
    assert len(ds) == 3
    ex = ds[2]
    assert ex["rgb"].shape == (32, 32, 3)
    assert ex["text"] == "figure number 2"
    assert ex["example_index"] == 2


def test_med_medvqa(tmp_path):
    """MedVQA: answer vocabulary, closed-set targets, ae-feature variant."""
    import json as _json

    from projects.med_benchmarking.datasets.image_text import MedVQA

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    ae_dir = tmp_path / "ae_features"
    ae_dir.mkdir()
    entries = []
    for i, (q, a) in enumerate(
        [("is it normal?", "yes"), ("is it normal?", "no"),
         ("what organ?", "lung")]
    ):
        _write_png(img_dir / f"v{i}.png", seed=20 + i)
        np.save(ae_dir / f"v{i}.npy", np.full((4,), float(i), np.float32))
        entries.append({"image": f"v{i}.png", "question": q, "answer": a})
    (tmp_path / "train.json").write_text(_json.dumps(entries))

    ds = MedVQA(root_dir=str(tmp_path), split="train", image_size=32,
                include_ae_features=True)
    assert len(ds) == 3
    # vocabulary is sorted unique answers: lung=0, no=1, yes=2
    assert ds.id2label == {0: "lung", 1: "no", 2: "yes"}
    ex = ds[0]
    assert ex["text"] == "is it normal?"
    assert ex["rgb_target"] == 2  # yes
    np.testing.assert_array_equal(ex["rgb_ae_features"], np.zeros(4))


def test_hf_image_classification_protocols(monkeypatch, tmp_path):
    """Official-split passthrough, BACK filtering, and string label mapping
    (reference nck.py:40-72, pcam.py:50) — exercised without network via a
    stubbed datasets.load_dataset."""

    class FakeHub:
        def __init__(self, rows):
            self.rows = rows

        def filter(self, fn):
            return FakeHub([r for r in self.rows if fn(r)])

        def train_test_split(self, **k):
            n = len(self.rows)
            return {"train": FakeHub(self.rows[: int(n * 0.75)]),
                    "test": FakeHub(self.rows[int(n * 0.75):])}

        def __len__(self):
            return len(self.rows)

        def __getitem__(self, i):
            return self.rows[i]

    img = np.zeros((8, 8, 3), np.uint8)
    rows = [{"image": img, "label": lbl}
            for lbl in ("ADI", "BACK", "TUM", "LYM", "BACK")]
    calls = {}

    def fake_load_dataset(name, cache_dir=None, split=None):
        calls["split"] = split
        return FakeHub(rows)

    import datasets as hf_datasets

    monkeypatch.setattr(hf_datasets, "load_dataset", fake_load_dataset)

    from projects.med_benchmarking.datasets.classification import NckCrc

    ds = NckCrc(root_dir=str(tmp_path), split="validation", image_size=16)
    # official split passed straight through (no 75/25 re-split)
    assert calls["split"] == "validation"
    # BACK rows filtered (reference nck.py:70-72)
    assert len(ds) == 3
    ex = ds[0]
    assert ex["rgb_target"] == 0  # "ADI" -> 0 via label_mapping
    assert ds[1]["rgb_target"] == 7  # "TUM" -> 7
    assert ds.id2label[7] == "colorectal adenocarcinoma epithelium"


def test_medvqa_vocab_from_train_split(tmp_path):
    """Eval splits must reuse the train split's answer vocabulary."""
    import json as _json

    from projects.med_benchmarking.datasets.image_text import MedVQA

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(str(img_dir / "a.png"))
    (tmp_path / "train.json").write_text(_json.dumps(
        [{"image": "a.png", "question": "q", "answer": a}
         for a in ("yes", "no", "maybe")]
    ))
    (tmp_path / "test.json").write_text(_json.dumps(
        [{"image": "a.png", "question": "q", "answer": "yes"}]
    ))
    train = MedVQA(root_dir=str(tmp_path), split="train", image_size=16)
    test = MedVQA(root_dir=str(tmp_path), split="test", image_size=16)
    assert test.answer_to_id == train.answer_to_id
    assert test[0]["rgb_target"] == train.answer_to_id["yes"]


def test_taxonomic_accuracy_table_logging(caplog):
    """Epoch-end table report (reference eval_task.py:352-404 parity): the
    flattened result keys parse back into (query->key, acc, k) rows x
    (split, level) columns and log as one table on process 0."""
    import logging

    from projects.bioscan_clip.eval_task import _log_accuracy_table

    results = {
        f"{split}_{q}_2_{k}_top_1_{t}_{lv}": 0.5
        for split in ("val_seen", "val_unseen")
        for q, k in (("rgb", "dna"), ("rgb", "all_key"))
        for t in ("micro", "macro")
        for lv in ("order", "family", "genus", "species")
    }
    with caplog.at_level(logging.INFO, logger="projects.bioscan_clip.eval_task"):
        _log_accuracy_table(results, [1])
    text = "\n".join(r.message for r in caplog.records)
    assert "rgb→dna (micro top-1)" in text
    assert "rgb→all_key (macro top-1)" in text
    assert "val_se.orde" in text and "val_un.spec" in text
    assert text.count("0.5000") == 32
