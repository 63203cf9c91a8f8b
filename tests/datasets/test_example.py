"""Tests for Example / ids / collation (reference test model: tests/datasets/test_example.py)."""

import numpy as np
import pytest

from mmlearn_tpu.constants import EXAMPLE_INDEX_KEY, MODALITY_PRESENCE_SUFFIX
from mmlearn_tpu.datasets.core import (
    Example,
    Modalities,
    collate_example_list,
    find_matching_indices,
)


def test_example_attribute_access():
    ex = Example({"rgb": np.zeros((3,)), "target": 1})
    assert ex.target == 1
    ex.text = "hello"
    assert ex["text"] == "hello"
    with pytest.raises(AttributeError):
        _ = ex.nonexistent


def test_create_ids():
    ex = Example({"rgb": np.zeros(3), "text": np.zeros(2), EXAMPLE_INDEX_KEY: 5})
    ex["dataset_index"] = 2
    ex.create_ids()
    assert set(ex["example_ids"]) == {"rgb", "text"}
    np.testing.assert_array_equal(ex["example_ids"]["rgb"], [2, 5])


def test_create_ids_requires_indices():
    ex = Example({"rgb": np.zeros(3)})
    with pytest.raises(ValueError):
        ex.create_ids()


def test_find_matching_indices():
    a = np.array([[0, 0], [0, 1], [1, 2], [0, 3]])
    b = np.array([[0, 1], [1, 2], [9, 9]])
    ia, ib = find_matching_indices(a, b)
    np.testing.assert_array_equal(ia, [1, 2])
    np.testing.assert_array_equal(ib, [0, 1])


def test_find_matching_indices_bad_shape():
    with pytest.raises(ValueError):
        find_matching_indices(np.zeros((3,)), np.zeros((3, 2)))


def test_collate_homogeneous():
    exs = [
        Example({"rgb": np.ones((4, 4)), "target": i, EXAMPLE_INDEX_KEY: i})
        for i in range(3)
    ]
    batch = collate_example_list(exs)
    assert batch["rgb"].shape == (3, 4, 4)
    np.testing.assert_array_equal(batch["target"], [0, 1, 2])
    assert f"rgb{MODALITY_PRESENCE_SUFFIX}" not in batch


def test_collate_heterogeneous_presence_mask():
    exs = [
        Example({"rgb": np.ones((2, 2)), "text": np.arange(3), EXAMPLE_INDEX_KEY: 0}),
        Example({"rgb": np.ones((2, 2)) * 2, EXAMPLE_INDEX_KEY: 1}),
        Example({"text": np.arange(3) + 5, EXAMPLE_INDEX_KEY: 2}),
    ]
    batch = collate_example_list(exs)
    assert batch["rgb"].shape == (3, 2, 2)
    assert batch["text"].shape == (3, 3)
    np.testing.assert_array_equal(
        batch[f"rgb{MODALITY_PRESENCE_SUFFIX}"], [True, True, False]
    )
    np.testing.assert_array_equal(
        batch[f"text{MODALITY_PRESENCE_SUFFIX}"], [True, False, True]
    )
    # missing slots are zero-padded
    np.testing.assert_array_equal(batch["rgb"][2], np.zeros((2, 2)))
    np.testing.assert_array_equal(batch["text"][1], np.zeros(3))


def test_collate_nested_example_ids():
    exs = []
    for i in range(2):
        ex = Example(
            {"rgb": np.zeros(2), "text": np.zeros(2), EXAMPLE_INDEX_KEY: i}
        )
        ex["dataset_index"] = 0
        ex.create_ids()
        exs.append(ex)
    batch = collate_example_list(exs)
    assert batch["example_ids"]["rgb"].shape == (2, 2)
    np.testing.assert_array_equal(batch["example_ids"]["rgb"][:, 1], [0, 1])


def test_collate_missing_ids_get_sentinel():
    ex0 = Example({"rgb": np.zeros(2), EXAMPLE_INDEX_KEY: 0})
    ex0["dataset_index"] = 0
    ex0.create_ids()
    ex1 = Example({"text": np.zeros(2), EXAMPLE_INDEX_KEY: 1})
    ex1["dataset_index"] = 1
    ex1.create_ids()
    batch = collate_example_list([ex0, ex1])
    np.testing.assert_array_equal(batch["example_ids"]["rgb"][1], [-1, -1])
    np.testing.assert_array_equal(batch["example_ids"]["text"][0], [-1, -1])


def test_collate_strings_kept_as_list():
    exs = [Example({"text": "a cat"}), Example({"text": "a dog"})]
    batch = collate_example_list(exs)
    assert batch["text"] == ["a cat", "a dog"]


def test_modality_registry():
    assert Modalities.has_modality("rgb")
    assert Modalities.get_modality("text").embedding == "text_embedding"
    assert Modalities.rgb.target == "rgb_target"
    mod = Modalities.register_modality("dna_test")
    assert mod.mask == "dna_test_mask"
    assert Modalities.get_modality_properties("dna_test")["embedding"] == (
        "dna_test_embedding"
    )
    with pytest.warns(UserWarning):
        Modalities.register_modality("dna_test")


def test_modality_custom_properties():
    mod = Modalities.register_modality("spectro", {"fft": "{}_fft_key"})
    assert mod.fft == "spectro_fft_key"
    assert mod.embedding == "spectro_embedding"


def test_collate_fuzz_random_missing_keys():
    """Randomized hetero batches: dense shapes + correct presence masks."""
    rng = np.random.default_rng(0)
    keys = ["rgb", "text", "audio"]
    shapes = {"rgb": (4, 4, 3), "text": (7,), "audio": (5, 2)}
    for trial in range(25):
        n = int(rng.integers(2, 9))
        present = rng.random((n, len(keys))) > 0.4
        present[rng.integers(0, n)] = True  # ensure one full example
        examples = []
        for i in range(n):
            ex = Example({EXAMPLE_INDEX_KEY: i})
            for j, k in enumerate(keys):
                if present[i, j]:
                    ex[k] = np.full(shapes[k], float(i))
            examples.append(ex)
        batch = collate_example_list(examples)
        for j, k in enumerate(keys):
            if not present[:, j].any():
                assert k not in batch
                continue
            assert batch[k].shape == (n, *shapes[k])
            mask_key = f"{k}{MODALITY_PRESENCE_SUFFIX}"
            if present[:, j].all():
                assert mask_key not in batch
            else:
                np.testing.assert_array_equal(batch[mask_key], present[:, j])
                # absent rows zero-padded; present rows carry their value
                for i in range(n):
                    expected = float(i) if present[i, j] else 0.0
                    np.testing.assert_array_equal(
                        batch[k][i], np.full(shapes[k], expected)
                    )
