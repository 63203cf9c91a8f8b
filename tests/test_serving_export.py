"""Serving artifacts: exported encoders match direct encode, any batch size."""

import functools

import numpy as np
import optax
import pytest

from mmlearn_tpu.modules.encoders import TextTransformer, VisionTransformer
from mmlearn_tpu.serving import load_encoder, save_encoder
from mmlearn_tpu.tasks import ContrastivePretraining

import jax


def _tiny_task_and_batch():
    task = ContrastivePretraining(
        encoders={
            "rgb": VisionTransformer(
                img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4,
                use_cls_token=True, global_pool="cls", proj_dim=16,
            ),
            "text": TextTransformer(
                vocab_size=32, max_length=8, embed_dim=32, depth=2,
                num_heads=4, causal=True, pooling="eos", proj_dim=16,
            ),
        },
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3),
    )
    rng = np.random.default_rng(0)
    batch = {
        "rgb": rng.standard_normal((4, 16, 16, 3)).astype(np.float32),
        "text": rng.integers(1, 30, (4, 8)).astype(np.int32),
    }
    params = task.init_params(jax.random.key(0), batch)
    return task, params, batch


def _batch_of(batch, key, n, seed=7):
    rng = np.random.default_rng(seed)
    v = batch[key]
    if np.issubdtype(v.dtype, np.integer):
        return {key: rng.integers(1, 30, (n,) + v.shape[1:]).astype(v.dtype)}
    return {key: rng.standard_normal((n,) + v.shape[1:]).astype(v.dtype)}


@pytest.mark.parametrize("modality", ["rgb", "text"])
def test_exported_encoder_matches_direct(tmp_path, modality):
    task, params, batch = _tiny_task_and_batch()
    art = str(tmp_path / f"{modality}_artifact")
    save_encoder(art, task, params, modality, batch, platforms=("cpu",))

    serve = load_encoder(art)
    assert serve.meta["modality"] == modality
    assert serve.meta["embedding_dim"] == 16

    # batch-polymorphic: one artifact, multiple batch sizes
    for n in (3, 5):
        sub = _batch_of(batch, modality, n, seed=n)
        got = np.asarray(serve(sub))
        want = np.asarray(task.encode(params, sub, modality, normalize=True))
        assert got.shape == (n, 16)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # normalized embeddings, ready for similarity serving
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-4)


def test_ijepa_encode_and_export(tmp_path):
    """IJEPA exposes the same encode contract → exportable like CLIP."""
    from mmlearn_tpu.modules.encoders import VisionTransformerPredictor
    from mmlearn_tpu.tasks import IJEPA

    task = IJEPA(
        encoder=VisionTransformer(
            img_size=16, patch_size=8, embed_dim=32, depth=1, num_heads=4,
        ),
        predictor=VisionTransformerPredictor(
            num_patches=4, embed_dim=32, predictor_embed_dim=32, depth=1,
            num_heads=4,
        ),
        optimizer=functools.partial(optax.adamw, learning_rate=1e-3),
    )
    rng = np.random.default_rng(0)
    batch = {"rgb": rng.standard_normal((4, 16, 16, 3)).astype(np.float32)}
    params = task.init_params(jax.random.key(0), batch)

    direct = np.asarray(task.encode(params, batch, normalize=True))
    assert direct.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(direct, axis=1), 1.0, rtol=1e-4)

    art = str(tmp_path / "ijepa_artifact")
    save_encoder(art, task, params, "rgb", batch, platforms=("cpu",))
    serve = load_encoder(art)
    got = np.asarray(serve({"rgb": batch["rgb"]}))
    np.testing.assert_allclose(got, direct, atol=1e-5)


def test_embedding_index_merges_multihost_manifests(tmp_path):
    """Per-process manifests/shards (multi-host export) merge on load."""
    from mmlearn_tpu.serving import EmbeddingIndex
    import json

    rng = np.random.default_rng(0)
    for p, rows in ((0, [0, 1]), (1, [2, 3, 4])):
        emb = np.eye(8, dtype=np.float32)[rows]
        name = f"rgb_p{p}_00000.npz"
        np.savez(
            tmp_path / name,
            embeddings=emb,
            example_index=np.asarray(rows),
            dataset_index=np.zeros(len(rows), np.int64),
        )
        manifest = {"rgb": {"shards": [name], "rows": len(rows), "dim": 8,
                            "normalized": True}}
        (tmp_path / f"manifest_p{p}.json").write_text(json.dumps(manifest))

    index = EmbeddingIndex.load(str(tmp_path), "rgb")
    assert len(index) == 5
    scores, ids = index.query(np.eye(8, dtype=np.float32)[:5], k=1)
    assert ids[:, 0].tolist() == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(scores[:, 0], 1.0)


def test_embedding_index_dedups_replicated_export(tmp_path):
    """Multi-host export without a distributed sampler → every process
    wrote the full corpus; load() keeps one copy of each example."""
    from mmlearn_tpu.serving import EmbeddingIndex
    import json

    emb = np.eye(4, dtype=np.float32)
    for p in (0, 1):
        name = f"rgb_p{p}_00000.npz"
        np.savez(tmp_path / name, embeddings=emb,
                 example_index=np.arange(4),
                 dataset_index=np.zeros(4, np.int64))
        (tmp_path / f"manifest_p{p}.json").write_text(json.dumps(
            {"rgb": {"shards": [name], "rows": 4, "dim": 4,
                     "normalized": True}}))

    index = EmbeddingIndex.load(str(tmp_path), "rgb")
    assert len(index) == 4  # 8 rows written, 4 unique
    _, ids = index.query(emb, k=1)
    assert ids[:, 0].tolist() == [0, 1, 2, 3]
    assert len(EmbeddingIndex.load(str(tmp_path), "rgb", dedup=False)) == 8


def test_embedding_index_approx_query():
    """approx=True routes through jax.lax.approx_max_k (TPU-optimized MIPS;
    exact on CPU so results must agree here)."""
    from mmlearn_tpu.serving import EmbeddingIndex

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((64, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = EmbeddingIndex(emb)
    exact_s, exact_i = index.query(emb[:5], k=3)
    approx_s, approx_i = index.query(emb[:5], k=3, approx=True)
    assert approx_i[:, 0].tolist() == exact_i[:, 0].tolist() == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(approx_s[:, 0], 1.0, atol=1e-5)


def test_embedding_index_blockwise_query_is_exact():
    """An explicit block_size forces the streaming blockwise path (per-block
    top_k + merge) — the result must be IDENTICAL to the single full-axis
    top_k, including an uneven tail block and duplicate scores at the k
    boundary. (Blockwise is the memory path for corpora whose full sim
    matrix would blow HBM — see EmbeddingIndex.query.)"""
    from mmlearn_tpu.serving import EmbeddingIndex

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((101, 8)).astype(np.float32)  # uneven vs 16
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((7, 8)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    index = EmbeddingIndex(emb)

    plain_s, plain_i = index.query(q, k=5)  # 101 < default block: full axis
    block_s, block_i = index.query(q, k=5, block_size=16)
    np.testing.assert_allclose(block_s, plain_s, rtol=1e-6)
    # ties at equal score may legitimately order differently; compare as
    # (score, id) sets per row
    for row in range(q.shape[0]):
        assert set(block_i[row].tolist()) == set(plain_i[row].tolist())
    # k larger than the tail block still works (k clamped to block? no —
    # k=5 < block 16; also probe k > last-block occupancy: 101 % 16 = 5)
    s6, i6 = index.query(q, k=13, block_size=16)
    ps6, pi6 = index.query(q, k=13)
    np.testing.assert_allclose(s6, ps6, rtol=1e-6)


def test_embedding_index_rejects_mixed_normalization(tmp_path):
    from mmlearn_tpu.serving import EmbeddingIndex
    import json
    import pytest as _pytest

    for p, norm in ((0, True), (1, False)):
        name = f"rgb_p{p}_00000.npz"
        np.savez(tmp_path / name, embeddings=np.eye(2, dtype=np.float32),
                 example_index=np.arange(2) + 2 * p,
                 dataset_index=np.zeros(2, np.int64))
        (tmp_path / f"manifest_p{p}.json").write_text(json.dumps(
            {"rgb": {"shards": [name], "rows": 2, "dim": 2,
                     "normalized": norm}}))
    with _pytest.raises(ValueError, match="normalized"):
        EmbeddingIndex.load(str(tmp_path), "rgb")


def test_embedding_export_arg_validation():
    from mmlearn_tpu.tasks import EmbeddingExport

    with pytest.raises(ValueError, match="float32 or float16"):
        EmbeddingExport(output_dir="/tmp/x", dtype="bfloat16")
    with pytest.raises(ValueError, match="modalities"):
        EmbeddingExport(output_dir="/tmp/x", modalities=[])


def test_meta_inputs_record_only_consumed_keys(tmp_path):
    """meta.json 'inputs' is the serving feed contract — training plumbing
    keys (example_index, presence masks, ...) must not appear."""
    task, params, batch = _tiny_task_and_batch()
    batch = dict(batch)
    batch["example_index"] = np.arange(4)
    batch["rgb_presence"] = np.ones(4, bool)
    art = str(tmp_path / "a")
    save_encoder(art, task, params, "rgb", batch, platforms=("cpu",))
    serve = load_encoder(art)
    assert set(serve.meta["inputs"]) == {"rgb"}
    # feeding exactly meta['inputs'] works
    out = np.asarray(serve({"rgb": batch["rgb"]}))
    assert out.shape == (4, 16)


def test_artifact_loads_without_model_code(tmp_path):
    """The loader path touches only the artifact files (no task object)."""
    task, params, batch = _tiny_task_and_batch()
    art = str(tmp_path / "rgb_artifact")
    save_encoder(art, task, params, "rgb", batch, platforms=("cpu",))
    del task, params

    serve = load_encoder(art)
    out = np.asarray(serve({"rgb": batch["rgb"]}))
    assert out.shape == (4, 16)
    assert np.isfinite(out).all()


def test_embedding_index_unusable_block_size_keeps_memory_routing(monkeypatch):
    """A block_size that cannot be honored (>= corpus, or < k) must fall
    back to the MEMORY routing, not to an unconditional full-axis sim — a
    corpus past the HBM budget has to stream regardless of the requested
    block."""
    from mmlearn_tpu.modules.metrics import retrieval_recall as rr
    from mmlearn_tpu.serving import EmbeddingIndex
    from mmlearn_tpu.serving import index as index_mod

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((101, 8)).astype(np.float32)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    index = EmbeddingIndex(emb)
    want_s, want_i = index.query(q, k=5)

    # corpus "past the budget": every sim is too big, blocks of 16 (the
    # index reads the knobs through the metric module — one source of truth)
    monkeypatch.setattr(rr, "TOPK_SIM_BYTES_BUDGET", 0)
    monkeypatch.setattr(rr, "TOPK_BLOCK", 16)

    def full_axis_forbidden(*a, **k):
        raise AssertionError("full-axis sim materialized past the budget")

    monkeypatch.setattr(index_mod, "_topk_scores_chunk", full_axis_forbidden)
    # block_size >= corpus and block_size < k are both unusable as given
    for bad_block in (101, 4):
        s, i = index.query(q, k=5, block_size=bad_block)
        np.testing.assert_allclose(s, want_s, rtol=1e-6)
        for row in range(q.shape[0]):
            assert set(i[row].tolist()) == set(want_i[row].tolist())
