"""Regression tests for the round-3 deep-review fixes (single-process
testable subset; the multihost-only fixes are covered by code paths the
8-device mesh can exercise or documented as pod-only)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_all_gather_untiled_detached_reinserts_local_shard():
    """all_gather(with_grad=False, tiled=False): untiled layout stacks a
    leading axis — the local-shard reinsertion must match (was a rank
    mismatch crash)."""
    from mmlearn_tpu.parallel.collectives import all_gather

    n = jax.device_count()
    x = jnp.arange(n * 2.0).reshape(n, 2)

    def f(xs):
        g = all_gather(xs, "d", with_grad=False, tiled=False)
        return jnp.sum(g * g)

    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("d",))
    out = jax.jit(
        jax.shard_map(
            jax.grad(f), mesh=mesh, in_specs=P("d"), out_specs=P("d")
        )
    )(x)
    # gradient flows ONLY through the local shard: d/dx sum(g^2) = 2x
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(x), atol=1e-6)


def test_freeze_mask_errors_on_unmatched_prefix():
    from mmlearn_tpu.peft import freeze_layers_mask

    params = {"layer_0": {"kernel": np.zeros((2, 2))}}
    with pytest.raises(ValueError, match="block_prefix"):
        freeze_layers_mask(params, 1)  # default prefix 'blocks_' matches nothing
    # bool specs never need block structure
    mask = freeze_layers_mask(params, True)
    assert jax.tree.leaves(mask) == [False]


def test_imagenet_wnid_keyed_classnames(tmp_path):
    from mmlearn_tpu.datasets.builtin.imagenet import ImageNet

    classes = ["n01440764", "n01443537"]
    raw = {"n01440764": "tench", "n01443537": "goldfish"}
    (tmp_path / "classnames.json").write_text(json.dumps(raw))
    out = ImageNet._load_id2label(str(tmp_path), classes)
    assert out == {0: "tench", 1: "goldfish"}


def test_resize_image_passthrough_contract():
    from mmlearn_tpu.datasets.processors.transforms import resize_image

    gray = np.zeros((8, 8), np.uint8)
    out = resize_image(gray, 8)  # pass-through branch
    assert out.dtype == np.float32 and out.shape == (8, 8, 1)
    out2 = resize_image(np.zeros((4, 4), np.uint8), 8)  # resize branch
    assert out2.dtype == np.float32 and out2.shape == (8, 8, 1)


def test_grain_loader_rejects_multiprocess_streams():
    pytest.importorskip("grain")
    from mmlearn_tpu.datasets.core import CombinedDataset
    from mmlearn_tpu.datasets.core.grain_loader import GrainDataLoader
    from mmlearn_tpu.datasets.core.example import Example

    class Stream:
        def __len__(self):
            return 4

        def __iter__(self):
            return iter(Example({"rgb": np.zeros(2, np.float32)}) for _ in range(4))

    ds = CombinedDataset([Stream()])
    loader = GrainDataLoader(ds, batch_size=2, num_workers=2)
    with pytest.raises(ValueError, match="stream"):
        next(iter(loader))


def test_ratio_sampler_defaults_size_proportional():
    """Reference default: ratios = dataset lengths (samplers.py:23-27)."""
    from mmlearn_tpu.datasets.core import CombinedDataset
    from mmlearn_tpu.datasets.core.example import Example
    from mmlearn_tpu.datasets.core.samplers import CombinedDatasetRatioSampler

    class DS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return Example({"rgb": np.zeros(1)})

    ds = CombinedDataset([DS(900), DS(100)])
    sampler = CombinedDatasetRatioSampler(
        ds, rank=0, num_replicas=1, seed=0
    )
    np.testing.assert_allclose(sampler.ratios, [0.9, 0.1])
    # drawn indices reflect the proportions (multinomial, so approximate)
    idx = np.fromiter(iter(sampler), dtype=np.int64)
    small = (idx >= 900).mean()
    assert 0.02 < small < 0.25, small


def test_find_matching_indices_excludes_sentinel():
    from mmlearn_tpu.datasets.core.example import find_matching_indices

    a = np.array([[0, 1], [-1, -1], [0, 2]])
    b = np.array([[-1, -1], [0, 2]])
    ai, bi = find_matching_indices(a, b)
    # only the true (0,2) pair matches; the two sentinels must not pair up
    assert ai.tolist() == [2] and bi.tolist() == [1]


def test_combined_dataset_set_epoch_resets_stream_iterators():
    from mmlearn_tpu.datasets.core import CombinedDataset
    from mmlearn_tpu.datasets.core.example import Example

    class EpochStream:
        def __init__(self):
            self.epoch = 0

        def set_epoch(self, e):
            self.epoch = e

        def __len__(self):
            return 2

        def __iter__(self):
            e = self.epoch
            return iter(
                Example({"rgb": np.asarray([e * 10 + i], np.float32)})
                for i in range(2)
            )

    ds = CombinedDataset([EpochStream()])
    assert float(ds[0]["rgb"][0]) == 0.0  # epoch 0, first item
    ds.set_epoch(1)
    # the cached epoch-0 iterator must be dropped: next reads start epoch 1
    assert float(ds[0]["rgb"][0]) == 10.0
