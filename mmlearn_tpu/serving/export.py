"""Export trained encoders as standalone serving artifacts.

An artifact directory contains:

- ``encoder.hlo`` — the serialized ``jax.export.Exported`` encoder
  (StableHLO): ``fn(params, batch) -> embeddings``, batch-polymorphic over
  the leading dimension, exported for one or more platforms (``tpu``,
  ``cpu``, ``cuda``);
- ``params.msgpack`` — the weights (flax msgpack; restores without the
  model class);
- ``meta.json`` — modality, normalization flag, embedding dim, input
  shapes/dtypes.

Why this design (TPU-first): serving should not depend on the training
repo's Python model code or its version. StableHLO freezes the compiled
computation — the loader needs only jax. The batch dimension is symbolic
(``jax.export.symbolic_args_specs``), so one artifact serves any batch
size; XLA compiles per concrete shape on first use and caches.

The reference has no equivalent — its eval jobs rebuild the torch modules
from config (/root/reference/mmlearn/cli/run.py:134,145-146).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _encoder_input_keys(
    modality: str, example_batch: Mapping[str, Any]
) -> list[str]:
    """The batch keys the exported artifact actually consumes."""
    from mmlearn_tpu.datasets.core.modalities import Modalities

    mod = Modalities.get_modality(str(modality).lower())
    # the encoder consumes the modality's own keys only (input ids/pixels +
    # attention mask); everything else in the batch is training plumbing
    keys = [k for k in (mod.name, mod.attention_mask) if k in example_batch]
    if not keys:
        raise ValueError(
            f"example_batch has no '{mod.name}' input for modality {modality}"
        )
    return keys


def export_encoder(
    task: Any,
    params: Any,
    modality: str,
    example_batch: Mapping[str, Any],
    normalize: bool = True,
    platforms: Optional[Sequence[str]] = None,
    batch_polymorphic: bool = True,
):
    """Export one modality encoder as a ``jax.export.Exported``.

    Args:
        task: the task owning the encoder (e.g. ``ContrastivePretraining``).
        params: trained parameter tree (``TrainState.params``).
        modality: which tower to export (``"rgb"``, ``"text"``, ...).
        example_batch: a batch holding this modality's input keys; only
            shapes/dtypes are read.
        normalize: bake L2 normalization into the artifact (the
            similarity-serving layout).
        platforms: lowering targets, e.g. ``("tpu", "cpu")``. Default: the
            current backend.
        batch_polymorphic: symbolic leading dim — one artifact, any batch
            size.
    """
    keys = _encoder_input_keys(modality, example_batch)
    sub_batch = {
        k: jax.ShapeDtypeStruct(
            tuple(example_batch[k].shape), example_batch[k].dtype
        )
        for k in keys
    }

    def encode(params, batch):
        return task.encode(params, batch, modality, normalize=normalize)

    from jax import export as jexport

    if batch_polymorphic:
        batch_specs = jexport.symbolic_args_specs(sub_batch, "b, ...")
    else:
        batch_specs = sub_batch
    param_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params,
    )
    plats = tuple(platforms) if platforms else (jax.default_backend(),)
    return jexport.export(jax.jit(encode), platforms=plats)(
        param_specs, batch_specs
    )


def save_encoder(
    output_dir: str,
    task: Any,
    params: Any,
    modality: str,
    example_batch: Mapping[str, Any],
    normalize: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export + write the full artifact directory. Returns ``output_dir``."""
    import flax.serialization

    exported = export_encoder(
        task, params, modality, example_batch,
        normalize=normalize, platforms=platforms,
    )
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "encoder.hlo"), "wb") as f:
        f.write(exported.serialize())
    # msgpack restores to plain dicts/ndarrays — no model class needed
    host_params = jax.device_get(params)
    with open(os.path.join(output_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(host_params))
    out_shape = jax.tree.leaves(exported.out_avals)[0]
    meta = {
        "modality": str(modality).lower(),
        "normalized": bool(normalize),
        "embedding_dim": int(out_shape.shape[-1]),
        "platforms": list(exported.platforms),
        # only the keys the artifact consumes — the serving feed contract
        # (leading batch dim is symbolic; shape[0] here is just the example's)
        "inputs": {
            k: {
                "shape": list(np.shape(example_batch[k])),
                "dtype": str(np.asarray(example_batch[k]).dtype),
            }
            for k in _encoder_input_keys(modality, example_batch)
        },
    }
    with open(os.path.join(output_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return output_dir


def load_encoder(artifact_dir: str) -> Callable[[Mapping[str, Any]], jax.Array]:
    """Load an artifact into a ``fn(batch) -> embeddings`` callable.

    Needs only jax + flax (deserialization); not the model's Python code.
    """
    import flax.serialization

    from jax import export as jexport

    with open(os.path.join(artifact_dir, "encoder.hlo"), "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    with open(os.path.join(artifact_dir, "params.msgpack"), "rb") as f:
        params = flax.serialization.msgpack_restore(f.read())

    def encode(batch: Mapping[str, Any]) -> jax.Array:
        return exported.call(params, dict(batch))

    encode.meta = json.load(open(os.path.join(artifact_dir, "meta.json")))  # type: ignore[attr-defined]
    return encode
