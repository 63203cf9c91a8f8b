"""Flax→HF/timm/reference export round-trip tests.

hf_export must be the exact inverse of hf_utils: converting a torch
checkpoint in and exporting it back reproduces every tensor, and exporting
our own trained params produces state dicts torch modules load and run.
This closes the migration loop (docs/migrating.md): users of the reference
can pretrain here and take weights back to their torch pipelines.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mmlearn_tpu.hf_export import (  # noqa: E402
    export_bert,
    export_clip,
    export_ijepa_predictor,
    export_ijepa_vit,
    export_timm_vit,
    to_torch_state_dict,
    unstack_block_params,
)
from mmlearn_tpu.hf_utils import (  # noqa: E402
    convert_bert,
    convert_ijepa_predictor,
    convert_ijepa_vit,
    convert_timm_vit,
    load_clip_from_hf,
    stack_block_params,
)
from mmlearn_tpu.ops.fused_attention import (  # noqa: E402
    interleave_qkv_heads,
    uninterleave_qkv_heads,
)


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPConfig, CLIPModel

    config = CLIPConfig.from_text_vision_configs(
        text_config=transformers.CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, eos_token_id=98,
        ),
        vision_config=transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        ),
        projection_dim=24,
    )
    torch.manual_seed(0)
    return CLIPModel(config).eval()


def _np_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _assert_sd_equal(exported: dict, original: dict, atol=0.0):
    """Every exported tensor must byte-match the original checkpoint; keys
    the converters intentionally drop (position-id buffers, recomputed
    sincos pos-emb) are the only ones allowed to be missing."""
    for key, val in exported.items():
        assert key in original, f"exported unknown key {key}"
        np.testing.assert_allclose(
            val, original[key].astype(np.float32), atol=atol, rtol=0,
            err_msg=key,
        )
    missing = set(original) - set(exported)
    allowed = ("position_ids", "pos_embed")
    assert all(any(a in k for a in allowed) for k in missing), missing


def test_qkv_interleave_roundtrip():
    rng = np.random.default_rng(0)
    for shape in ((16, 24), (24,), (3, 16, 24)):
        x = rng.standard_normal(shape).astype(np.float32)
        y = uninterleave_qkv_heads(interleave_qkv_heads(x, 4), 4)
        np.testing.assert_array_equal(x, y)
        y = interleave_qkv_heads(uninterleave_qkv_heads(x, 2), 2)
        np.testing.assert_array_equal(x, y)


@pytest.mark.integration_test
def test_clip_export_roundtrip(tiny_clip):
    model = tiny_clip
    orig = _np_sd(model)
    converted = load_clip_from_hf(model)
    sd = export_clip(
        converted["vision"][1], converted["text"][1],
        log_logit_scale=converted["log_logit_scale"],
        vision_num_heads=4, text_num_heads=4,
    )
    _assert_sd_equal(sd, orig)

    # the exported dict loads into a fresh torch CLIPModel and reproduces
    # the original model's features
    model2 = transformers.CLIPModel(model.config).eval()
    missing, unexpected = model2.load_state_dict(
        to_torch_state_dict(sd), strict=False
    )
    assert not unexpected
    assert all("position_ids" in k for k in missing)
    imgs = torch.from_numpy(
        np.random.default_rng(0)
        .standard_normal((2, 3, 32, 32))
        .astype(np.float32)
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            model2.get_image_features(pixel_values=imgs).numpy(),
            model.get_image_features(pixel_values=imgs).numpy(),
            atol=1e-6, rtol=1e-6,
        )


@pytest.mark.integration_test
def test_bert_export_roundtrip():
    from transformers import BertConfig, BertModel

    config = BertConfig(
        vocab_size=60, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16,
    )
    torch.manual_seed(1)
    model = BertModel(config).eval()
    orig = _np_sd(model)
    params = convert_bert(orig, depth=2, num_heads=4)
    sd = export_bert(params, num_heads=4)
    _assert_sd_equal(sd, orig)
    model2 = BertModel(config).eval()
    missing, unexpected = model2.load_state_dict(
        to_torch_state_dict(sd), strict=False
    )
    assert not unexpected
    assert all("position_ids" in k for k in missing)


def test_timm_vit_export_roundtrip():
    """Our params → timm state dict → converted back: identical tree."""
    from mmlearn_tpu.modules.encoders.vision import VisionTransformer

    vit = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        use_cls_token=True, learned_pos_embed=True, final_norm=True,
    )
    params = vit.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    sd = export_timm_vit(params, num_heads=4)
    back = convert_timm_vit(sd, num_heads=4)

    flat_a = jax.tree_util.tree_flatten_with_path(jax.device_get(params))[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, atol=0, rtol=0, err_msg=str(path))


def test_ijepa_export_roundtrip():
    from mmlearn_tpu.modules.encoders.vision import (
        VisionTransformer,
        VisionTransformerPredictor,
    )

    enc = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        use_cls_token=False, learned_pos_embed=False, final_norm=True,
    )
    enc_params = enc.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    back = convert_ijepa_vit(
        export_ijepa_vit(enc_params, num_heads=4), depth=2, num_heads=4
    )
    jax.tree.map(
        np.testing.assert_array_equal, jax.device_get(enc_params), back
    )

    pred = VisionTransformerPredictor(
        num_patches=16, embed_dim=32, predictor_embed_dim=32, depth=1,
        num_heads=4,
    )
    z = jnp.ones((1, 6, 32))
    enc_masks = jnp.arange(6)[None, None]
    pred_masks = jnp.arange(3)[None, None]
    pred_params = pred.init(jax.random.key(1), z, enc_masks, pred_masks)[
        "params"
    ]
    back = convert_ijepa_predictor(
        export_ijepa_predictor(pred_params, num_heads=4), depth=1,
        num_heads=4,
    )
    jax.tree.map(
        np.testing.assert_array_equal, jax.device_get(pred_params), back
    )


def test_export_accepts_scan_stacked_params():
    """Scan-format (block_stack/blocks/block) params export identically to
    the per-layer layout they were stacked from."""
    from mmlearn_tpu.modules.encoders.vision import VisionTransformer

    vit = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        use_cls_token=True, learned_pos_embed=True, final_norm=True,
    )
    params = jax.device_get(
        vit.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    )
    from_per_layer = export_timm_vit(params, num_heads=4)
    stacked = stack_block_params(dict(params), depth=2)
    assert "blocks_0" not in stacked
    from_stacked = export_timm_vit(stacked, num_heads=4)
    assert set(from_per_layer) == set(from_stacked)
    for k in from_per_layer:
        np.testing.assert_array_equal(from_per_layer[k], from_stacked[k])


def test_unstack_is_noop_without_scan_subtree():
    params = {"norm": {"scale": np.ones(3), "bias": np.zeros(3)}}
    assert unstack_block_params(params) == params


def _timm_style_vit():
    from mmlearn_tpu.modules.encoders.vision import VisionTransformer

    vit = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        use_cls_token=True, learned_pos_embed=True, final_norm=True,
        global_pool="cls",
    )
    params = vit.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    return vit, params


class _FakeContrastive:
    """Duck-typed ContrastivePretraining surface for export_task."""

    def __init__(self, encoders, heads=None):
        self.modalities = list(encoders)
        self.encoder_keys = {m: m for m in encoders}
        self.head_keys = {m: m for m in encoders}
        self.encoders = encoders
        self.heads = heads or {}
        self.peft_configs = {}


def test_export_task_folds_dense_head_into_projection_slot():
    """A single-Dense projection head must fold into the tower's projection
    (timm 'head'/CLIP '*_projection') so the exported model computes the
    task's actual embeddings — not the unprojected tower output."""
    from mmlearn_tpu.hf_export import export_task

    vit, params = _timm_style_vit()
    head = {
        "kernel": np.random.default_rng(0)
        .standard_normal((32, 16))
        .astype(np.float32),
        "bias": np.zeros(16, np.float32),
    }
    sds = export_task(
        _FakeContrastive({"rgb": vit}, heads={"rgb": object()}),
        {"encoders": {"rgb": params}, "heads": {"rgb": head}},
    )
    assert "heads.rgb" not in sds  # folded, not exported separately
    np.testing.assert_array_equal(sds["rgb"]["head.weight"], head["kernel"].T)
    np.testing.assert_array_equal(sds["rgb"]["head.bias"], head["bias"])


def test_export_task_unfoldable_head_exports_separately():
    """An MLP head has no projection-slot representation: it must come out
    as its own 'heads.<key>' entry (generic torch naming), with the tower
    still exported."""
    from mmlearn_tpu.hf_export import export_task

    vit, params = _timm_style_vit()
    mlp_head = {
        "fc1": {"kernel": np.ones((32, 8), np.float32),
                "bias": np.zeros(8, np.float32)},
        "fc2": {"kernel": np.ones((8, 16), np.float32),
                "bias": np.zeros(16, np.float32)},
    }
    sds = export_task(
        _FakeContrastive({"rgb": vit}, heads={"rgb": object()}),
        {"encoders": {"rgb": params}, "heads": {"rgb": mlp_head}},
    )
    assert "head.weight" not in sds["rgb"]
    assert sds["heads.rgb"]["fc1.weight"].shape == (8, 32)  # torch (out,in)
    assert sds["heads.rgb"]["fc2.bias"].shape == (16,)


def test_export_ijepa_learned_pos_and_proj_handling():
    """No-cls ViTs: a learned pos_embed exports (not silently dropped); a
    projection head on the I-JEPA format is a loud error."""
    from mmlearn_tpu.hf_export import export_module
    from mmlearn_tpu.modules.encoders.vision import VisionTransformer

    vit = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=1, num_heads=4,
        use_cls_token=False, learned_pos_embed=True, final_norm=True,
    )
    params = vit.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    sd = export_module(vit, params)
    np.testing.assert_array_equal(
        sd["pos_embed"], np.asarray(params["pos_embed"], np.float32)
    )
    with pytest.raises(ValueError, match="projection head"):
        export_module(
            vit, {**params, "proj": {"kernel": np.ones((32, 8), np.float32)}}
        )


def test_unstack_preserves_siblings_of_scan_subtree():
    stacked = {"w": np.arange(4, dtype=np.float32).reshape(2, 2)}
    params = {
        "block_stack": {
            "blocks": {"block": stacked, "extra_norm": {"scale": np.ones(2)}}
        },
        "other": np.zeros(1),
    }
    out = unstack_block_params(params)
    assert "blocks_0" in out and "blocks_1" in out
    np.testing.assert_array_equal(out["blocks_0"]["w"], [0.0, 1.0])
    # the sibling living INSIDE 'blocks' must survive
    np.testing.assert_array_equal(
        out["block_stack"]["blocks"]["extra_norm"]["scale"], np.ones(2)
    )
    assert "other" in out


def test_export_task_merges_lora():
    """export_task must export the *effective* weights: base + LoRA delta
    (a torch consumer has no LoRA factors to apply)."""
    from mmlearn_tpu.hf_export import export_task, export_timm_vit
    from mmlearn_tpu.modules.encoders.vision import VisionTransformer
    from mmlearn_tpu.peft import LoRAConfig, apply_lora, init_lora_params

    vit = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        use_cls_token=True, learned_pos_embed=True, final_norm=True,
    )
    params = vit.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    cfg = LoRAConfig(r=2)
    lora = init_lora_params(params, cfg, jax.random.key(1))
    assert lora, "LoRA matched no kernels — target patterns drifted"
    # b inits to zero (delta 0); make the merge visible
    lora = jax.tree.map(lambda x: x + 0.25, lora)

    class FakeTask:
        encoders = {"rgb": vit}
        peft_configs = {"rgb": cfg}

    sds = export_task(
        FakeTask(), {"encoders": {"rgb": params}, "lora": {"rgb": lora}}
    )
    expected = export_timm_vit(
        jax.device_get(apply_lora(params, lora, cfg)), num_heads=4
    )
    assert set(sds["rgb"]) == set(expected)
    for k in expected:
        np.testing.assert_allclose(
            sds["rgb"][k], expected[k], atol=1e-6, err_msg=k
        )
    unmerged = export_timm_vit(jax.device_get(params), num_heads=4)
    assert not np.allclose(
        sds["rgb"]["blocks.0.attn.qkv.weight"],
        unmerged["blocks.0.attn.qkv.weight"],
    )
