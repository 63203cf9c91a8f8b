"""Configurable MLP (parity: /root/reference/mmlearn/modules/layers/mlp.py).

Supports an explicit ``hidden_dims`` list or a multiplicative
``hidden_dims_multiplier`` spec (reference lines 62-127), optional bias,
inter-layer norm, activation, and dropout. Dense layers are named ``fc{i}``
so the tensor-parallel partitioning rules
(:data:`mmlearn_tpu.parallel.partitioning.DEFAULT_RULES`) match them.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mmlearn_tpu.conf import store


def _get_activation(name: str | Callable) -> Callable:
    if callable(name):
        return name
    import jax

    table = {
        "relu": jax.nn.relu,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
        "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
        "silu": jax.nn.silu,
        "tanh": jnp.tanh,
        "identity": lambda x: x,
    }
    if name not in table:
        raise ValueError(f"Unknown activation '{name}'. Available: {sorted(table)}")
    return table[name]


@store(group="modules/layers", name="MLP", populate_full_signature=False)
class MLP(nn.Module):
    """Multi-layer perceptron with configurable width schedule."""

    out_dim: Optional[int] = None
    hidden_dims: Optional[Sequence[int]] = None
    hidden_dims_multiplier: Optional[Sequence[float]] = None
    activation: str = "gelu"
    norm_layer: Optional[str] = None  # None | "layernorm"
    bias: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_dim = x.shape[-1]
        if self.hidden_dims is not None:
            hidden = list(self.hidden_dims)
        elif self.hidden_dims_multiplier is not None:
            hidden = [int(in_dim * m) for m in self.hidden_dims_multiplier]
        else:
            hidden = []
        dims = hidden + [self.out_dim if self.out_dim is not None else in_dim]
        act = _get_activation(self.activation)
        from mmlearn_tpu.modules.layers.quantization import dense

        for i, dim in enumerate(dims):
            x = dense(
                features=dim,
                use_bias=self.bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"fc{i + 1}",
            )(x)
            if i < len(dims) - 1:
                if self.norm_layer == "layernorm":
                    x = nn.LayerNorm(dtype=self.dtype, name=f"norm{i + 1}")(x)
                x = act(x)
                if self.dropout > 0.0:
                    x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x
