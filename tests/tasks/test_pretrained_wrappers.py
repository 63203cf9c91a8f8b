"""End-to-end: CLIP wrapper factories feed converted weights into the task."""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from mmlearn_tpu.modules.encoders.clip import (  # noqa: E402
    HFCLIPTextEncoderWithProjection,
    HFCLIPVisionEncoderWithProjection,
)
from mmlearn_tpu.tasks import ContrastivePretraining  # noqa: E402


@pytest.fixture(scope="module")
def tiny_clip_model():
    from transformers import CLIPConfig, CLIPModel

    config = CLIPConfig(
        text_config=transformers.CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, eos_token_id=98,
        ).to_dict(),
        vision_config=transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        ).to_dict(),
        projection_dim=24,
    )
    torch.manual_seed(0)
    return CLIPModel(config).eval()


@pytest.mark.integration_test
def test_clip_wrapper_task_matches_torch_logits(tiny_clip_model):
    model = tiny_clip_model
    task = ContrastivePretraining(
        encoders={
            "rgb": HFCLIPVisionEncoderWithProjection(model),
            "text": HFCLIPTextEncoderWithProjection(model),
        },
        optimizer=functools.partial(optax.adamw, learning_rate=1e-4),
    )
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(1, 90, (2, 12)).astype(np.int32)
    ids[:, -1] = 98
    batch = {
        "rgb": jnp.asarray(imgs),
        "text": jnp.asarray(ids),
        "text_attention_mask": jnp.ones((2, 12), jnp.int32),
    }
    params = task.init_params(jax.random.key(0), batch)
    emb = task.forward(params, batch)

    with torch.no_grad():
        t_img = model.get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        )
        t_txt = model.get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.ones(2, 12, dtype=torch.long),
        )
        t_img = torch.nn.functional.normalize(t_img, dim=-1).numpy()
        t_txt = torch.nn.functional.normalize(t_txt, dim=-1).numpy()

    np.testing.assert_allclose(
        np.asarray(emb["rgb_embedding"]), t_img, atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(emb["text_embedding"]), t_txt, atol=5e-4, rtol=1e-3
    )


@pytest.mark.integration_test
def test_clip_wrapper_scan_blocks_matches(tiny_clip_model):
    """scan_blocks wrappers produce the same embeddings as loop wrappers."""
    model = tiny_clip_model

    def build(scan):
        return ContrastivePretraining(
            encoders={
                "rgb": HFCLIPVisionEncoderWithProjection(model, scan_blocks=scan),
                "text": HFCLIPTextEncoderWithProjection(model, scan_blocks=scan),
            },
            optimizer=functools.partial(optax.adamw, learning_rate=1e-4),
        )

    rng = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32),
        "text": jnp.asarray(
            np.concatenate([rng.integers(1, 90, (2, 11)),
                            np.full((2, 1), 98)], axis=1), jnp.int32),
        "text_attention_mask": jnp.ones((2, 12), jnp.int32),
    }
    t_loop, t_scan = build(False), build(True)
    p_loop = t_loop.init_params(jax.random.key(0), batch)
    p_scan = t_scan.init_params(jax.random.key(0), batch)
    e_loop = t_loop.forward(p_loop, batch)
    e_scan = t_scan.forward(p_scan, batch)
    np.testing.assert_allclose(
        np.asarray(e_scan["rgb_embedding"]),
        np.asarray(e_loop["rgb_embedding"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(e_scan["text_embedding"]),
        np.asarray(e_loop["text_embedding"]), atol=1e-5,
    )
