"""BarcodeBERT DNA encoder (Flax).

Parity: /root/reference/projects/bioscan_clip/encoders.py — a BERT-MLM trunk
whose MLM decoder is replaced by a projection to ``projection_dim``; the
pooled embedding is ``softmax(logits, -1).mean(seq)`` (reference lines
73-95). Freezing/LoRA are handled by the framework's PEFT layer
(mmlearn_tpu.peft) rather than per-module ``requires_grad`` flags; pretrained
torch MLM checkpoints convert via :func:`load_barcode_bert_checkpoint`.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mmlearn_tpu.modules.encoders.base import EncoderOutput
from mmlearn_tpu.modules.encoders.bert import BertTextEncoder


class BarcodeBERT(nn.Module):
    """BERT trunk + MLM-style head projecting to the shared embedding dim."""

    vocab_size: int = 1027  # 3 specials + 4^5 k-mers
    projection_dim: int = 512
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    max_length: int = 256
    norm_eps: float = 1e-12
    scan_blocks: bool = False  # lax.scan over layers (faster compile)
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> EncoderOutput:
        trunk = BertTextEncoder(
            vocab_size=self.vocab_size,
            max_length=self.max_length,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            norm_eps=self.norm_eps,
            pooling="none",
            use_pooler=False,
            scan_blocks=self.scan_blocks,
            remat=self.remat,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bert",
        )
        hidden = trunk(
            input_ids, attention_mask=attention_mask, deterministic=deterministic
        ).last_hidden_state
        # MLM prediction head with the decoder swapped for a projection
        # (reference: model.cls.predictions.decoder → Linear(projection_dim))
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="transform")(hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="transform_norm")(x)
        logits = nn.Dense(self.projection_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="decoder")(x)
        pooled = nn.softmax(logits.astype(jnp.float32), axis=-1).mean(axis=1)
        return EncoderOutput(last_hidden_state=logits, pooler_output=pooled)


def load_barcode_bert_checkpoint(
    state_dict: Any, depth: int, projection_dim: int,
    num_heads: Optional[int] = None,
) -> dict:
    """Convert a torch BarcodeBERT/BertForMaskedLM state dict to our params.

    The trunk converts via :func:`mmlearn_tpu.hf_utils.convert_bert`; the MLM
    head (transform dense + LN) maps onto ``transform``/``transform_norm``;
    the (replaced) decoder is freshly initialized unless its shape matches.
    """
    from mmlearn_tpu.hf_utils import _layernorm, _linear, convert_bert

    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    params: dict[str, Any] = {
        "bert": convert_bert(sd, depth, prefix="bert", num_heads=num_heads)
    }
    if "cls.predictions.transform.dense.weight" in sd:
        params["transform"] = _linear(sd, "cls.predictions.transform.dense")
        params["transform_norm"] = _layernorm(
            sd, "cls.predictions.transform.LayerNorm"
        )
    if "cls.predictions.decoder.weight" in sd:
        w = np.asarray(sd["cls.predictions.decoder.weight"])
        if w.shape[0] == projection_dim:
            params["decoder"] = _linear(sd, "cls.predictions.decoder")
    return params
