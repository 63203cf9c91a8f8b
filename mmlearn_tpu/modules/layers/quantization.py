"""int8 quantized-forward Dense (opt-in training experiment).

The MXU runs int8 at 2x bf16 throughput (measured on v5e:
`benchmarks/int8_matmul_probe.py` — 273-405 int8 T/s vs 127-136 bf16 TF/s at
the flagship's vision matmul shapes). ``Int8Dense`` exploits this with
dynamic symmetric quantization:

- activations: per-row (per-token) absmax scale to int8;
- weights: per-output-channel absmax scale to int8;
- matmul in int8 with int32 accumulation, dequantized by ``sx * sw``;
- backward: straight-through estimator — ``dx``/``dw`` are computed from the
  *unquantized* operands in the compute dtype, i.e. exactly the gradients of
  the unquantized matmul (standard QAT practice; keeps the optimizer
  trajectory close to bf16 training while the forward enjoys int8 speed).

Param layout is identical to ``nn.Dense`` (``kernel``/``bias``), so
checkpoints are interchangeable and the flag can be flipped mid-training.

Modes (``MMLEARN_QUANT``, read at trace time like ``MMLEARN_ATTN_LOGITS``;
the transformer-block projections — attention qkv/out, MLP fc layers —
switch to ``Int8Dense``):

- ``int8_fwd``: int8 forward, exact STE backward (this module);
- ``int8``: full int8 training — int8 dgrad/wgrad with factorizable
  per-channel scales (this module). Measured 521 pairs/s vs 769 bf16 on the
  v5e flagship: the XLA-composed quantize/relayout stages cost more than
  the int8 MXU saves (round-3 trace);
- ``int8_sb``: switchback — fwd + dgrad through the **fused Pallas
  quantizing matmul** (:mod:`mmlearn_tpu.ops.int8_matmul`; scales/s8 copies
  never touch HBM), exact wgrad.

Off by default — the reference has no quantization support at all (its perf
tuning surface is TF32/fp16-mixed, /root/reference/mmlearn/cli/run.py:46-49);
this is a TPU-native capability addition.

Measured on the flagship CLIP ViT-B/16 step (one v5e, b256): **748 pairs/s
vs 770 bf16** — a net loss despite the 2x raw int8 matmul throughput,
because (a) only the forward third of the matmul FLOPs quantizes (the STE
backward stays bf16), (b) the per-matmul dynamic-quantization elementwise
costs ~0.2-0.8 ms/layer, and (c) remat reruns the quantize+dot chain in the
backward. int8 becomes a win only with quantized dgrad/wgrad (full int8
training) or inference-style forward-only workloads — kept opt-in for
those; see BASELINE.md.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import initializers


def quant_mode() -> Optional[str]:
    """Active quantization mode (trace-time env read)."""
    mode = os.environ.get("MMLEARN_QUANT", "").strip().lower()
    return mode or None


def exclude_int_dots(base_policy):
    """Wrap a remat policy so integer-accumulated dots are never saved.

    ``dots_with_no_batch_dims_saveable`` would otherwise stash the int8
    matmuls' s32 accumulators — at ViT-B b256 that is a 6.9 GB
    ``s32[12,256,197,3072]`` scan residual for fc1 alone (measured OOM).
    Recomputing the int8 dots in the backward is cheap; that is the point
    of running them in int8.
    """

    def policy(prim, *args, **params):
        if getattr(prim, "name", "") == "dot_general":
            pref = params.get("preferred_element_type")
            if pref is not None and jnp.issubdtype(pref, jnp.integer):
                return False
        return base_policy(prim, *args, **params)

    return policy


@jax.custom_vjp
def int8_matmul_ste(x: jax.Array, w: jax.Array) -> jax.Array:
    """``x @ w`` with int8 operands / int32 accumulation, STE backward.

    x: ``(..., K)`` activations; w: ``(K, N)`` weights. Returns ``(..., N)``
    in ``x.dtype``.
    """
    return _int8_fwd(x, w)


def _int8_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    qx, sx = _quantize(x, axis=-1)  # per-row
    qw, sw = _quantize(w, axis=0)  # per-out-channel
    acc = jax.lax.dot_general(
        qx, qw, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (acc.astype(jnp.float32) * (sx * sw)).astype(x.dtype)
    # named so remat policies can save the (bf16) dequantized output instead
    # of recomputing the whole quantize+dot chain in the backward
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(y, "int8_out")


def _int8_fwd_vjp(x, w):
    return _int8_fwd(x, w), (x, w)


def _int8_bwd_vjp(residuals, g):
    x, w = residuals
    # straight-through: exact gradients of the unquantized matmul
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    batch = tuple(range(x.ndim - 1))
    dw = jax.lax.dot_general(
        x, g, ((batch, batch), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


int8_matmul_ste.defvjp(_int8_fwd_vjp, _int8_bwd_vjp)


def _quantize(a: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric absmax int8 quantization along ``axis`` (scale keeps dims).

    THE canonical quantizer: ``_int8_fwd``, the full-int8 vjp, and
    ``ops.int8_matmul.quantize_weight`` all route through this function so
    the documented "numerics identical" parity between the XLA-composed and
    fused kernel paths cannot drift."""
    af = a.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(af), axis=axis, keepdims=True), 1e-6) / 127.0
    q = jnp.round(af / s).astype(jnp.int8)
    return q, s


@jax.custom_vjp
def int8_matmul_full(x: jax.Array, w: jax.Array) -> jax.Array:
    """``x @ w`` with int8 forward AND int8 dgrad/wgrad (full int8 training).

    All three matmuls of the layer run on the MXU's int8 path (measured
    2.1-3.0x bf16 on v5e, ``benchmarks/int8_matmul_probe.py``). Scales are
    dynamic symmetric absmax, always placed on **non-contracted** dims so
    they factor out of the int32 accumulation exactly:

    - fwd   ``y[t,n]  = Σ_k x[t,k] w[k,n]``: x per-row (t), w per-col (n);
    - dgrad ``dx[t,k] = Σ_n g[t,n] w[k,n]``: g per-row (t), w per-row (k);
    - wgrad ``dw[k,n] = Σ_t x[t,k] g[t,n]``: x per-col (k), g per-col (n).

    Unlike :func:`int8_matmul_ste` (forward-only quantization, exact STE
    backward), the gradients here carry quantization error — gated by the
    loss-trajectory parity test
    (tests/modules/test_quantization.py::test_int8_full_training_loss_parity).
    The reference has no quantization support (its knobs are TF32/fp16-mixed,
    /root/reference/mmlearn/cli/run.py:46-49).
    """
    return _int8_fwd(x, w)


def _int8_full_fwd_vjp(x, w):
    return _int8_fwd(x, w), (x, w)


def _int8_full_bwd_vjp(residuals, g):
    from jax.ad_checkpoint import checkpoint_name

    x, w = residuals
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w.shape[-1]
    x2 = x.reshape(-1, k)
    g2 = g.reshape(-1, n)

    # dgrad: dx = g @ w.T — g per-row, w per-row(k)
    qg_r, sg_r = _quantize(g2, axis=-1)  # (T,N), (T,1)
    qw_r, sw_r = _quantize(w, axis=1)  # (K,N), (K,1)
    dx_acc = jax.lax.dot_general(
        qg_r, qw_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (T, K)
    dx = (dx_acc.astype(jnp.float32) * (sg_r * sw_r.T)).astype(x.dtype)

    # wgrad: dw = x.T @ g — x per-col(k), g per-col(n)
    qx_c, sx_c = _quantize(x2, axis=0)  # (T,K), (1,K)
    qg_c, sg_c = _quantize(g2, axis=0)  # (T,N), (1,N)
    dw_acc = jax.lax.dot_general(
        qx_c, qg_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (K, N)
    dw = (dw_acc.astype(jnp.float32) * (sx_c.T * sg_c)).astype(w.dtype)

    dx = checkpoint_name(dx.reshape(*lead, k), "int8_dx")
    return dx, dw


int8_matmul_full.defvjp(_int8_full_fwd_vjp, _int8_full_bwd_vjp)


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` with an int8 forward matmul.

    ``full=False``: STE backward (exact bf16 gradients of the unquantized
    matmul). ``full=True``: int8 dgrad/wgrad as well (full int8 training).
    Same parameter names/shapes as ``nn.Dense``.
    """

    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Callable = initializers.lecun_normal()
    bias_init: Callable = initializers.zeros_init()
    full: bool = False
    #: "" (STE) | "int8_sb" (fused switchback kernel) — overrides ``full``
    mode: str = ""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,),
                       self.param_dtype)
            if self.use_bias
            else None
        )
        from flax.linen import dtypes

        x, kernel, bias = dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        if self.mode == "int8_sb":
            from mmlearn_tpu.ops.int8_matmul import switchback_matmul

            y = switchback_matmul(x, kernel)
        elif self.full:
            y = int8_matmul_full(x, kernel)
        else:
            y = int8_matmul_ste(x, kernel)
        if bias is not None:
            y = y + bias
        return y


def dense(*, features: int, use_bias: bool = True, dtype: Any = None,
          param_dtype: Any = jnp.float32, name: Optional[str] = None,
          kernel_init: Optional[Callable] = None,
          bias_init: Optional[Callable] = None) -> nn.Module:
    """Projection factory for transformer blocks: ``nn.Dense`` normally,
    :class:`Int8Dense` under ``MMLEARN_QUANT=int8_fwd``."""
    kw: dict = dict(
        features=features, use_bias=use_bias, dtype=dtype,
        param_dtype=param_dtype, name=name,
    )
    if kernel_init is not None:
        kw["kernel_init"] = kernel_init
    if bias_init is not None:
        kw["bias_init"] = bias_init
    mode = quant_mode()
    if mode == "int8_fwd":
        return Int8Dense(**kw)
    if mode == "int8":
        return Int8Dense(full=True, **kw)
    if mode == "int8_sb":
        # switchback: fused Pallas quantizing matmuls for fwd+dgrad, exact
        # wgrad (ops/int8_matmul.py) — the measured-fast int8 configuration
        return Int8Dense(mode="int8_sb", **kw)
    return nn.Dense(**kw)
