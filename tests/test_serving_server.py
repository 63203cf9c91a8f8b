"""HTTP serving daemon: embed + search over an exported artifact."""

import json
import threading
import urllib.request

import numpy as np

from tests.test_serving_export import _tiny_task_and_batch

from mmlearn_tpu.serving import save_encoder
from mmlearn_tpu.serving.server import serve
from mmlearn_tpu.tasks.embedding_export import EmbeddingExport


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_server_embed_and_search(tmp_path):
    task, params, batch = _tiny_task_and_batch()
    art = str(tmp_path / "artifact")
    save_encoder(art, task, params, "rgb", batch, platforms=("cpu",))

    # build a small index from the same encoder (8 corpus images)
    rng = np.random.default_rng(3)
    corpus = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    emb = np.asarray(task.encode(params, {"rgb": corpus}, "rgb", normalize=True))
    idx_dir = tmp_path / "index"
    idx_dir.mkdir()
    np.savez(idx_dir / "rgb_00000.npz", embeddings=emb,
             example_index=np.arange(8), dataset_index=np.zeros(8, np.int64))
    (idx_dir / "manifest.json").write_text(json.dumps(
        {"rgb": {"shards": ["rgb_00000.npz"], "rows": 8, "dim": 16,
                 "normalized": True}}))

    server = serve(art, port=0, index_dir=str(idx_dir))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["modality"] == "rgb"
        assert health["index_rows"] == 8

        # embed: batch-polymorphic, matches direct encode
        q = corpus[:3]
        status, out = _post(port, "/embed", {"inputs": {"rgb": q.tolist()}})
        assert status == 200
        got = np.asarray(out["embeddings"], np.float32)
        direct = np.asarray(
            task.encode(params, {"rgb": q}, "rgb", normalize=True)
        )
        np.testing.assert_allclose(got, direct, atol=1e-4)

        # search: querying corpus images returns themselves first
        status, out = _post(
            port, "/search", {"inputs": {"rgb": q.tolist()}, "k": 2}
        )
        assert status == 200
        assert np.asarray(out["example_index"])[:, 0].tolist() == [0, 1, 2]
        np.testing.assert_allclose(
            np.asarray(out["scores"])[:, 0], 1.0, atol=1e-4
        )

        # approx search (TPU approx_max_k path; exact on CPU)
        status, out = _post(
            port, "/search",
            {"inputs": {"rgb": q.tolist()}, "k": 2, "approx": True},
        )
        assert status == 200
        assert np.asarray(out["example_index"])[:, 0].tolist() == [0, 1, 2]

        # error paths stay clean JSON
        status, out = _post(port, "/embed", {"inputs": {"wrong": [1]}})
        assert status == 400 and "exactly the keys" in out["error"]
        status, out = _post(port, "/nope", {})
        assert status == 404
    finally:
        server.shutdown()
        server.server_close()


def test_server_concurrent_requests_two_shapes(tmp_path):
    """8 threads × mixed /embed + /search with TWO batch shapes: exercises
    the ThreadingHTTPServer handler pool, the device-work lock, and the
    per-shape executable cache (serving/server.py design note) under
    contention. Every response must be correct — not merely 200."""
    from concurrent.futures import ThreadPoolExecutor

    task, params, batch = _tiny_task_and_batch()
    art = str(tmp_path / "artifact")
    save_encoder(art, task, params, "rgb", batch, platforms=("cpu",))

    rng = np.random.default_rng(7)
    corpus = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    emb = np.asarray(task.encode(params, {"rgb": corpus}, "rgb", normalize=True))
    idx_dir = tmp_path / "index"
    idx_dir.mkdir()
    np.savez(idx_dir / "rgb_00000.npz", embeddings=emb,
             example_index=np.arange(8), dataset_index=np.zeros(8, np.int64))
    (idx_dir / "manifest.json").write_text(json.dumps(
        {"rgb": {"shards": ["rgb_00000.npz"], "rows": 8, "dim": 16,
                 "normalized": True}}))

    server = serve(art, port=0, index_dir=str(idx_dir))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    direct = {
        1: np.asarray(task.encode(params, {"rgb": corpus[:1]}, "rgb",
                                  normalize=True)),
        3: np.asarray(task.encode(params, {"rgb": corpus[:3]}, "rgb",
                                  normalize=True)),
    }

    def one_request(i):
        b = 1 if i % 2 == 0 else 3  # alternate batch shapes
        q = corpus[:b]
        if i % 3 == 0:
            status, out = _post(
                port, "/search", {"inputs": {"rgb": q.tolist()}, "k": 2}
            )
            assert status == 200, out
            assert np.asarray(out["example_index"])[:, 0].tolist() == list(
                range(b)
            )
            return ("search", b)
        status, out = _post(port, "/embed", {"inputs": {"rgb": q.tolist()}})
        assert status == 200, out
        np.testing.assert_allclose(
            np.asarray(out["embeddings"], np.float32), direct[b], atol=1e-4
        )
        return ("embed", b)

    try:
        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(one_request, range(32)))
        # both shapes and both endpoints actually ran
        assert {r[1] for r in results} == {1, 3}
        assert {r[0] for r in results} == {"embed", "search"}
    finally:
        server.shutdown()
