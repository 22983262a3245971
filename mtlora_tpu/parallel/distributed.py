"""Multi-host initialization + cross-host reductions.

TPU-native replacement for the reference's torch.distributed plumbing
(main.py:552-575: NCCL init_process_group + barrier + rank-offset seeds).
On TPU pods, ``jax.distributed.initialize`` wires all hosts into one
global device mesh; per-host batch shards are assembled with
``make_array_from_process_local_data``; meters reduce with a tree-sum
over a jitted psum (the reduction the reference's meters never do —
SURVEY.md section 2.2/3.4).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Dict:
    """Initialize multi-host JAX (no-op when single-process).

    Returns {"rank", "world", "local_devices", "global_devices"}.
    Seeds should be offset by rank like the reference (main.py:570):
    ``seed = config.SEED + info["rank"]``.
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return {
        "rank": jax.process_index(),
        "world": jax.process_count(),
        "local_devices": jax.local_devices(),
        "global_devices": jax.devices(),
    }


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Coordination-service barrier (control plane, NOT a device
    collective). Used to align processes right before their FIRST
    device/gloo collective: on CPU test meshes gloo context init has a
    hard 30 s key-value handshake that compile-time skew (one process
    hitting a warm compile cache the other just wrote) easily exceeds.
    No-op single-process; swallows errors on backends without a
    coordination client."""
    if jax.process_count() == 1:
        return
    # unique id per call: barrier names cannot be reused, and every
    # process runs the same control flow so the counters stay in step
    global _barrier_seq
    _barrier_seq += 1
    try:
        from jax._src import distributed

        if distributed.global_state.client is not None:
            distributed.global_state.client.wait_at_barrier(
                f"{name}_{_barrier_seq}", timeout_ms)
    except Exception:
        pass


_barrier_seq = 0


def global_batch_from_local(local_batch: Dict, mesh) -> Dict:
    """Assemble a globally-sharded batch from per-process local shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)


def allreduce_meter_states(states: Dict) -> Dict:
    """Sum meter accumulator pytrees across hosts.

    Meter states are pure sums (evaluation/meters.py), so a psum over a
    trivial jitted fn reduces them exactly.
    """
    if jax.process_count() == 1:
        return states
    import jax.numpy as jnp
    from jax.experimental.multihost_utils import process_allgather

    gathered = process_allgather(jax.tree.map(np.asarray, states))
    return jax.tree.map(lambda x: jnp.sum(x, axis=0), gathered)
