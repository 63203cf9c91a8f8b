"""Thin collective layer over named mesh axes.

Maps the reference's five gather patterns (SURVEY.md §2.8; call sites in
/root/reference/mmlearn/modules/losses/contrastive.py:431-578 and
metrics/retrieval_recall.py:140-161) onto XLA collectives. Two regimes:

1. **GSPMD (primary)**: the train step is jitted over the full global batch;
   contrastive logits are an ordinary global matmul and XLA inserts the
   all-gathers itself. Nothing from this module is needed.
2. **Explicit SPMD (``jax.shard_map``)**: these wrappers provide
   reference-equivalent semantics, including the detached-gather variant
   (``gather_with_grad=False`` — plain ``dist.all_gather`` in torch is
   non-differentiable except through the local shard, reproduced here with
   ``stop_gradient`` + local-shard reinsertion).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax


def all_gather(
    x: jax.Array,
    axis_name: str,
    *,
    with_grad: bool = True,
    tiled: bool = True,
) -> jax.Array:
    """All-gather along a named axis (inside shard_map/pmap).

    ``with_grad=True`` is the default JAX behavior (differentiable gather ==
    ``torch.distributed.nn.all_gather``). ``with_grad=False`` reproduces the
    reference's detached gather: gradients flow only through the local shard
    (contrastive.py:491-510).
    """
    gathered = lax.all_gather(x, axis_name, tiled=tiled)
    if with_grad:
        return gathered
    detached = lax.stop_gradient(gathered)
    idx = lax.axis_index(axis_name)
    # reinsert the (differentiable) local shard at this rank's offset —
    # layout-dependent: tiled concatenates along axis 0, untiled stacks a
    # new leading axis
    if tiled:
        return lax.dynamic_update_slice_in_dim(
            detached, x, idx * x.shape[0], axis=0
        )
    return lax.dynamic_update_slice_in_dim(detached, x[None], idx, axis=0)


def psum(x: Any, axis_name: str) -> Any:
    return lax.psum(x, axis_name)


def pmean(x: Any, axis_name: str) -> Any:
    return lax.pmean(x, axis_name)


def axis_index(axis_name: str) -> jax.Array:
    return lax.axis_index(axis_name)


def axis_size(axis_name: str) -> int:
    return lax.axis_size(axis_name)


def local_loss_label_offset(axis_name: str, local_batch: int) -> jax.Array:
    """Label offset for the local-loss trick.

    With only one side's features gathered, the positives for local row ``i``
    sit at global column ``rank * local_batch + i`` (reference label-offset
    logic: contrastive.py:162-219, simplified here because SPMD guarantees
    equal shard sizes).
    """
    return lax.axis_index(axis_name) * local_batch


def process_allgather(x: Any) -> Any:
    """Host-side gather of per-process arrays (metric state, labels).

    Replaces ``torchmetrics.gather_all_tensors`` / ``all_gather_object`` for
    eval accumulation (retrieval_recall.py:140-161).
    """
    import jax.experimental.multihost_utils as mhu

    if jax.process_count() == 1:
        return jax.tree.map(jnp.asarray, x)
    return mhu.process_allgather(x, tiled=True)


def process_allgather_object(obj: Any) -> list:
    """Gather an arbitrary picklable object from every process.

    Equivalent of ``torch.distributed.all_gather_object`` (used by the
    reference's bioscan eval, projects/bioscan_clip/eval_task.py:222-229):
    returns ``[obj_process0, obj_process1, ...]``. Single-process returns
    ``[obj]`` without serialization.
    """
    import pickle

    import numpy as np

    if jax.process_count() == 1:
        return [obj]
    import jax.experimental.multihost_utils as mhu  # pragma: no cover

    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = np.asarray(
        mhu.process_allgather(np.array([[len(buf)]], np.int64), tiled=True)
    ).reshape(-1)
    padded = np.zeros((1, int(lens.max())), np.uint8)
    padded[0, : len(buf)] = buf
    gathered = np.asarray(mhu.process_allgather(padded, tiled=True))
    return [
        pickle.loads(gathered[p, : int(lens[p])].tobytes())
        for p in range(len(lens))
    ]


def process_local_rows(arr: Any) -> "np.ndarray":
    """This process's rows of a possibly globally-sharded device array.

    Under multihost SPMD, batches are global ``jax.Array``s assembled from
    process-local data (``make_array_from_process_local_data``);
    ``np.asarray`` on one raises "spans non-addressable devices". Eval hooks
    store per-process rows and stitch processes together once at epoch end
    (``process_allgather`` / ``process_allgather_object``) — the TPU
    equivalent of the reference's torchmetrics gather
    (reference retrieval_recall.py:140-161). Rows replicated over fsdp/model
    axes are deduplicated by their batch-dim offset.
    """
    import numpy as np

    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        seen: set = set()
        parts = []
        for shard in sorted(
            arr.addressable_shards, key=lambda s: (s.index[0].start or 0)
        ):
            start = shard.index[0].start or 0
            if start in seen:
                continue
            seen.add(start)
            parts.append(np.asarray(shard.data))
        return np.concatenate(parts, axis=0)
    return np.asarray(arr)


def process_local_rows_device(arr: Any) -> Any:
    """Like :func:`process_local_rows` but stays ON DEVICE.

    Fully-addressable arrays pass through untouched (no host transfer —
    eval embeddings accumulate device-resident); globally-sharded arrays
    are reduced to this process's rows by concatenating the local shards.
    """
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        seen: set = set()
        parts = []
        for shard in sorted(
            arr.addressable_shards, key=lambda s: (s.index[0].start or 0)
        ):
            start = shard.index[0].start or 0
            if start in seen:
                continue
            seen.add(start)
            parts.append(shard.data)
        if len(parts) == 1:
            return parts[0]
        # each shard is committed to ITS device; concatenating arrays
        # committed to different devices is an error under jax's committed
        # placement rules — co-locate on the first local device (an
        # intra-host device-to-device copy, still no host round-trip)
        dev = next(iter(parts[0].devices()))
        return jnp.concatenate(
            [jax.device_put(p, dev) for p in parts], axis=0
        )
    return arr
