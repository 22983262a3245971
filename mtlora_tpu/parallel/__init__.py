"""Mesh construction and sharding policy for SPMD execution."""

from mtlora_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
