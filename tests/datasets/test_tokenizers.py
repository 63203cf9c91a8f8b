"""Tests for tokenizer processors (local vocab — no network)."""

import numpy as np
import pytest

from mmlearn_tpu.datasets.processors.tokenizers import HFTokenizer, Img2Seq


@pytest.fixture(scope="module")
def bert_tokenizer(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "cat", "dog", "photo", "of", "the"]
    path = tmp_path_factory.mktemp("tok") / "vocab.txt"
    path.write_text("\n".join(vocab))
    return transformers.BertTokenizer(str(path), do_lower_case=True)


@pytest.mark.integration_test
def test_hf_tokenizer_wrapper(bert_tokenizer):
    tok = HFTokenizer(tokenizer=bert_tokenizer, max_length=8)
    out = tok("a photo of a cat")
    assert set(out) == {"text", "text_attention_mask"}
    assert out["text"].shape == (8,)  # fixed max_length padding
    assert out["text"].dtype == np.int32
    assert out["text_attention_mask"][:7].all()  # cls + 5 tokens + sep

    batch = tok(["a cat", "a photo of the dog"])
    assert batch["text"].shape == (2, 8)
    # per-example and batched tokenization agree
    np.testing.assert_array_equal(batch["text"][0], tok("a cat")["text"])


@pytest.mark.integration_test
def test_hf_tokenizer_truncation(bert_tokenizer):
    tok = HFTokenizer(tokenizer=bert_tokenizer, max_length=4)
    out = tok("a photo of the cat dog cat dog")
    assert out["text"].shape == (4,)


def test_img2seq_patchify():
    img = np.arange(8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    seq = Img2Seq(img_size=8, patch_size=4)(img)
    assert seq.shape == (4, 48)
    # first patch = top-left 4x4 block
    np.testing.assert_array_equal(
        seq[0].reshape(4, 4, 3), img[:4, :4]
    )
