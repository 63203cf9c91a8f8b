"""SPMD parallelism: mesh, sharding rules, collectives."""

from mmlearn_tpu.parallel.collectives import (
    all_gather,
    axis_index,
    axis_size,
    local_loss_label_offset,
    pmean,
    process_allgather,
    psum,
)
from mmlearn_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    MESH_AXES,
    MODEL_AXIS,
    batch_sharding,
    batch_spec,
    create_mesh,
    get_global_mesh,
    local_batch_size,
    replicated,
    set_global_mesh,
    shard_batch,
)
from mmlearn_tpu.parallel.partitioning import (
    DEFAULT_RULES,
    infer_param_specs,
    param_shardings,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "DEFAULT_RULES",
    "FSDP_AXIS",
    "MESH_AXES",
    "MODEL_AXIS",
    "all_gather",
    "axis_index",
    "axis_size",
    "batch_sharding",
    "batch_spec",
    "create_mesh",
    "get_global_mesh",
    "infer_param_specs",
    "local_batch_size",
    "local_loss_label_offset",
    "param_shardings",
    "pmean",
    "process_allgather",
    "psum",
    "replicated",
    "set_global_mesh",
    "shard_batch",
    "shard_params",
]
