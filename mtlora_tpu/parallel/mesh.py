"""Device mesh + sharding policy.

TPU-native replacement for the reference's (vestigial) torch.distributed
data parallelism (SURVEY.md section 2.2: the reference declares DDP but
never wraps the model or shards the sampler, so >1 GPU trains redundant
replicas). Here DP is real: a 1-D ``data`` mesh, batch sharded over it,
parameters replicated, and XLA inserts the gradient all-reduce over ICI
from the sharding annotations on the jitted train step — the
jax.sharding equivalent of the NCCL all-reduce the reference never calls.

The mesh is 1-D because the flagship model (Swin-T, 28M params) fits
comfortably per chip; scaling axis is the batch. ``MESH_SHAPE`` accepts
extra axes for future model sharding (e.g. [-1, 2] -> data x model); the
model axis is plumbed through ``batch_sharding`` but unused by Swin-T.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


AXIS_DATA = "data"
AXIS_MODEL = "model"


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Create a mesh; shape -1 entries absorb remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(mesh_shape or [-1])
    if any(s == -1 for s in shape):
        fixed = int(np.prod([s for s in shape if s != -1])) or 1
        shape = [n // fixed if s == -1 else s for s in shape]
    assert int(np.prod(shape)) == n, (
        f"mesh shape {shape} does not cover {n} devices")
    axis_names = (AXIS_DATA, AXIS_MODEL)[: len(shape)]
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded on the leading (batch) axis."""
    return NamedSharding(mesh, P(AXIS_DATA))


def replicated(mesh: Mesh) -> NamedSharding:
    """Params / optimizer state: replicated everywhere."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a host batch dict with the batch axis sharded.

    Multi-process form of make_array_from_process_local_data; single-
    process (this harness) reduces to a sharded device_put.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
