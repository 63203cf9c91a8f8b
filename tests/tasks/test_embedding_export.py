"""EmbeddingExport writes a loadable, exact embedding index."""

import functools
import json
import os

import numpy as np
import optax

from mmlearn_tpu.datasets.core import CombinedDataset, DataLoader
from mmlearn_tpu.modules.encoders import TextTransformer, VisionTransformer
from mmlearn_tpu.tasks import (
    ContrastivePretraining,
    EmbeddingExport,
    EvaluationSpec,
)
from mmlearn_tpu.trainer import Trainer

from tests.tasks.test_eval_tasks import PairedEvalDataset


def test_embedding_export_shards_and_manifest(tmp_path):
    out = str(tmp_path / "index")
    export = EmbeddingExport(
        output_dir=out, modalities=["rgb", "text"], normalize=True,
        shard_size=16,  # flush per 16-row batch → 2 shards for 30 rows
    )
    task = ContrastivePretraining(
        encoders={
            "rgb": VisionTransformer(
                img_size=16, patch_size=8, embed_dim=32, depth=1, num_heads=4,
                use_cls_token=True, global_pool="cls", proj_dim=16,
            ),
            "text": TextTransformer(
                vocab_size=32, max_length=8, embed_dim=32, depth=1,
                num_heads=4, causal=True, pooling="eos", proj_dim=16,
            ),
        },
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3),
        evaluation_tasks={"export": EvaluationSpec(task=export)},
    )
    # 30 examples, batch 16, padded partial batch: the export must drop the
    # 2 padding rows via batch_validity
    ds = CombinedDataset([PairedEvalDataset(size=30)])
    loader = DataLoader(ds, batch_size=16, pad_partial_batches=True)
    trainer = Trainer(max_steps=1, default_root_dir=str(tmp_path), seed=0)
    trainer.fit(
        task,
        DataLoader(ds, batch_size=16, drop_last=True),
    )
    results = trainer.validate(task, loader)

    assert results["export/rgb_rows"] == 30
    assert results["export/text_rows"] == 30
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    for mod in ("rgb", "text"):
        m = manifest[mod]
        assert m["rows"] == 30 and m["dim"] == 16 and m["normalized"]
        assert len(m["shards"]) == 2  # one per flushed 16-row batch
        embs, ex_idx = [], []
        for name in m["shards"]:
            shard = np.load(os.path.join(out, name))
            embs.append(shard["embeddings"])
            ex_idx.append(shard["example_index"])
            assert shard["dataset_index"].shape == shard["example_index"].shape
        embs = np.concatenate(embs)
        ex_idx = np.concatenate(ex_idx)
        assert embs.shape == (30, 16)
        # L2-normalized, no padding rows, ids are exactly the dataset indices
        np.testing.assert_allclose(
            np.linalg.norm(embs, axis=1), 1.0, rtol=2e-2
        )
        assert sorted(ex_idx.tolist()) == list(range(30))

    # exported vectors must equal a direct encode of the same examples
    from mmlearn_tpu.tasks.hooks import EvalRuntime

    runtime = EvalRuntime(task, trainer.state.params)
    batch = loader.collate_fn([ds[i] for i in range(4)])
    direct = np.asarray(runtime.encode(batch, "rgb", normalize=True))
    shard0 = np.load(os.path.join(out, manifest["rgb"]["shards"][0]))
    # no shuffle: the first shard holds examples 0..19 in dataset order
    assert shard0["example_index"][:4].tolist() == [0, 1, 2, 3]
    np.testing.assert_allclose(
        shard0["embeddings"][:4], direct.astype(shard0["embeddings"].dtype),
        atol=2e-3,
    )

    # the serving index loads the exported shards and answers top-k queries:
    # querying with the vectors themselves must return themselves first
    from mmlearn_tpu.serving import EmbeddingIndex

    index = EmbeddingIndex.load(out, modality="rgb")
    assert len(index) == 30
    scores, ids = index.query(direct, k=3)
    assert scores.shape == (4, 3) and ids.shape == (4, 3)
    # the dataset has 4 repeated class patterns, so exact-duplicate rows tie
    # at score 1 — assert class-consistent hits instead of exact ids
    labels = ds.datasets[0].labels
    assert [labels[i] for i in ids[:, 0]] == [labels[i] for i in range(4)]
    np.testing.assert_allclose(scores[:, 0], 1.0, atol=5e-3)
