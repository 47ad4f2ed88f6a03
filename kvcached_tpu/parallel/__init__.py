"""Parallelism: device meshes, sharded steps, page-table broadcast."""

from .mesh import (
    build_sharded_decode_step,
    llama_param_specs,
    make_mesh,
    pool_spec_partition,
    shard_params,
)

__all__ = [
    "make_mesh",
    "llama_param_specs",
    "shard_params",
    "pool_spec_partition",
    "build_sharded_decode_step",
]
