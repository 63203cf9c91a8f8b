"""Device mesh construction and batch/param sharding helpers.

This is the TPU-native replacement for the reference's distributed runtime
(Lightning DDP + NCCL, SURVEY.md §2.8). Parallelism is expressed as a
`jax.sharding.Mesh` with three named axes:

- ``data``: pure data parallelism (the only strategy the reference has);
- ``fsdp``: weight sharding (ZeRO-3-style) — batch is sharded over
  ``data × fsdp`` jointly, params over ``fsdp``;
- ``model``: tensor parallelism for attention heads / MLP width.

Under ``jax.jit`` + GSPMD, annotating arrays with ``NamedSharding`` on these
axes is sufficient for XLA to partition matmuls and insert ICI collectives
(all-gather / reduce-scatter) automatically; no NCCL-style call sites needed.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, MODEL_AXIS)
MESH_AXES_SEQ = (DATA_AXIS, FSDP_AXIS, SEQ_AXIS, MODEL_AXIS)

_GLOBAL_MESH: Optional[Mesh] = None


def create_mesh(
    data: int = -1,
    fsdp: int = 1,
    model: int = 1,
    seq: int = 1,
    slices: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh over the available devices.

    ``data=-1`` fills whatever device count remains after the other axes.
    ``seq > 1`` adds a fourth ``seq`` axis (between fsdp and model) for
    sequence parallelism (ring attention, :mod:`mmlearn_tpu.ops.ring_attention`);
    the default keeps the 3-axis ``data×fsdp×model`` layout.

    ``slices > 1`` builds a **multi-slice (hybrid ICI+DCN) mesh** via
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh``: the leading
    ``slices`` granules of the ``data`` axis ride the slow DCN links while
    fsdp/seq/model collectives stay on intra-slice ICI. Axis names and all
    partitioning rules are unchanged — the data axis is simply laid out
    slice-major so its cross-slice segment carries only gradient
    all-reduces. ``data`` counts the *total* data-parallel size across
    slices and must be divisible by ``slices``. This is the pod-scale
    analogue of the reference's multi-node SLURM scaling
    (/root/reference/README.md:134-147). On platforms whose devices carry
    no ``slice_index`` (CPU emulation, the driver dryrun) the device list
    is treated as slice-major, which produces the identical logical mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    other = fsdp * model * seq
    if data == -1:
        if n % other != 0:
            raise ValueError(
                f"{n} devices not divisible by fsdp*seq*model={other}"
            )
        data = n // other
    if data * other > n:
        raise ValueError(
            f"Mesh {data}x{fsdp}x{seq}x{model} needs more than the "
            f"{n} available devices"
        )
    if slices > 1 and data % slices != 0:
        raise ValueError(
            f"data={data} must be divisible by slices={slices}"
        )
    # an explicit smaller mesh uses a prefix of the devices — taken
    # *per slice* when slices>1, else a plain prefix covers only the first
    # slice(s) and the hybrid mesh builder finds fewer slice granules than
    # requested (real devices: group by slice_index; emulation: the list is
    # slice-major by convention)
    # real multi-slice hardware: devices carry DISTINCT slice_index values
    # (CPU emulation under jax.distributed also *defines* slice_index, but
    # as 0 on every device — that must take the slice-major emulation path)
    real_slices = (
        slices > 1
        and hasattr(devices[0], "slice_index")
        and len({getattr(d, "slice_index", 0) for d in devices}) > 1
    )
    total = data * other
    if slices > 1 and total < n:
        need = total // slices
        if real_slices:
            by_slice: dict = {}
            for d in devices:
                by_slice.setdefault(d.slice_index, []).append(d)
            groups = [by_slice[k] for k in sorted(by_slice)]
        else:
            per = n // slices
            groups = [
                devices[s * per : (s + 1) * per] for s in range(slices)
            ]
        # only the first `slices` groups are used — an undersized UNUSED
        # physical slice must not block the carve
        if len(groups) < slices or any(
            len(g) < need for g in groups[:slices]
        ):
            raise ValueError(
                f"Cannot carve {slices} slices x {need} devices out of "
                f"{n} available devices"
            )
        devices = [d for g in groups[:slices] for d in g[:need]]
    else:
        devices = devices[:total]
    axes = MESH_AXES_SEQ if seq > 1 else MESH_AXES
    shape = (
        (data, fsdp, seq, model) if seq > 1 else (data, fsdp, model)
    )
    if slices > 1:
        per_slice = (data // slices,) + shape[1:]
        dcn = (slices,) + (1,) * (len(shape) - 1)
        if real_slices:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_hybrid_device_mesh(
                per_slice, dcn, devices=devices
            )
        else:
            # emulation: device list is slice-major; reshaping
            # (slices, data/slices, ...) then merging the leading two dims
            # yields the same slice-major data axis the hybrid mesh builds
            dev_array = np.asarray(devices).reshape(shape)
        return Mesh(dev_array, axes)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def set_global_mesh(mesh: Mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Mesh:
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = create_mesh()
    return _GLOBAL_MESH


def peek_global_mesh() -> Optional[Mesh]:
    """The active mesh if one was set, without creating a default one."""
    return _GLOBAL_MESH


def batch_spec() -> P:
    """Batch-dim sharding: data and fsdp axes jointly shard the batch."""
    return P((DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    """Per-host batch size for the input pipeline."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc != 0:
        raise ValueError(
            f"Global batch {global_batch_size} not divisible by process count {n_proc}"
        )
    return global_batch_size // n_proc


def _shardable(shape: tuple, spec: P, mesh: Mesh) -> bool:
    """Check every sharded dim is divisible by its mesh-axes product."""
    for dim, axes in zip(shape, spec):
        if axes is None:
            continue
        axes = (axes,) if isinstance(axes, str) else axes
        size = math.prod(mesh.shape[a] for a in axes)
        if dim % size != 0:
            return False
    return True


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Put a host batch pytree on the mesh with the batch dim sharded.

    Non-array leaves (strings, python lists of objects) are left on host.
    Scalar arrays are replicated. Batch-dim arrays that don't divide the
    data axes are replicated as a safe fallback.

    Multi-process: each process holds a *disjoint rank-strided shard* from
    its sampler, so the local array is only this process's slice of the
    global batch — assemble the global array with
    ``jax.make_array_from_process_local_data`` (a bare ``device_put`` would
    treat the local shard as the whole global batch and drop/misroute rows).
    Single-process keeps the cheaper ``device_put``.
    """
    sharding = batch_sharding(mesh)
    repl = replicated(mesh)
    multiprocess = jax.process_count() > 1

    def _put(leaf: Any, batch_led: bool = True) -> Any:
        if isinstance(leaf, (list, str)) or leaf is None:
            return leaf
        arr = np.asarray(leaf)
        if arr.dtype == object:
            return leaf
        if arr.ndim == 0:
            if multiprocess:  # exercised by tests/parallel/test_multiprocess.py
                return jax.make_array_from_process_local_data(
                    repl, arr, arr.shape
                )
            return jax.device_put(arr, repl)
        if multiprocess:  # exercised by tests/parallel/test_multiprocess.py
            p = jax.process_count()
            # aux arrays lead with a NON-batch dim (e.g. I-JEPA masks
            # (n_masks, B, K)) — their per-process batch concatenates on
            # axis 1. Routed by comparing the leading dim to the modality
            # batch size, NOT by divisibility: an aux dim that happens to
            # divide the data axes must not be assembled along axis 0
            # (host-0's masks would apply to host-1's samples).
            if not batch_led and arr.ndim >= 2:
                global1 = (arr.shape[0], arr.shape[1] * p) + arr.shape[2:]
                spec1 = P(None, (DATA_AXIS, FSDP_AXIS))
                if _shardable(global1, spec1, mesh):
                    return jax.make_array_from_process_local_data(
                        NamedSharding(mesh, spec1), arr, global1
                    )
            global0 = (arr.shape[0] * p,) + arr.shape[1:]
            if _shardable(global0, batch_spec(), mesh):
                return jax.make_array_from_process_local_data(
                    sharding, arr, global0
                )
            return jax.make_array_from_process_local_data(
                repl, arr, arr.shape
            )
        if _shardable(arr.shape, batch_spec(), mesh):
            return jax.device_put(arr, sharding)
        return jax.device_put(arr, repl)

    def _local_batch_dim(node: Any) -> Optional[int]:
        """Per-process batch size = leading dim of any modality array."""
        from mmlearn_tpu.datasets.core.modalities import Modalities

        if not isinstance(node, dict):
            return None
        for k, v in node.items():
            if (
                Modalities.has_modality(str(k))
                and hasattr(v, "shape")
                and np.ndim(v) >= 1
            ):
                return int(np.shape(v)[0])
        return None

    local_b = _local_batch_dim(batch)

    def _walk(node: Any) -> Any:
        if isinstance(node, dict):
            return {
                k: _walk(v)
                if isinstance(v, dict)
                else _put(
                    v,
                    batch_led=(
                        local_b is None
                        or not hasattr(v, "shape")
                        or np.ndim(v) == 0
                        or int(np.shape(v)[0]) == local_b
                    ),
                )
                for k, v in node.items()
            }
        return jax.tree.map(_put, node)

    return _walk(batch)
