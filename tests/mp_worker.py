"""Worker + shared logic for the multi-process data-parallel tests.

Run as a subprocess by tests/test_multiprocess.py with
``--coord host:port --nproc N --pid i`` and XLA_FLAGS forcing a virtual
CPU device count; also imported by the test to compute the
single-process reference in-process.

Exercises the real multi-host path the reference never had
(SURVEY.md section 2.2: torch.distributed declared but no DDP wrap, no
DistributedSampler, reduce_tensor defined-never-called):
  - jax.distributed.initialize across processes,
  - global_batch_from_local (make_array_from_process_local_data),
  - one jitted DP train step over the global mesh,
  - allreduce_meter_states for cross-host meter reduction.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TASKS = ("semseg", "normals", "sal", "human_parts")


def toy_config():
    from mtlora_tpu.config import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return load_config(
        os.path.join(root, "configs/mtlora/tiny_448",
                     "mtlora_tiny_448_r64_scale4_pertask.yaml"),
        tasks=list(TASKS), img_size=64,
        opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
              "MODEL.SWIN.EMBED_DIM", "24",
              "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
              "MODEL.SWIN.WINDOW_SIZE", "4",
              "AMP_ENABLE", "False"])


def make_global_batch(ndev):
    import numpy as np

    r = np.random.RandomState(0)
    B = 2 * ndev
    return {
        "image": r.randn(B, 64, 64, 3).astype(np.float32),
        "semseg": r.randint(0, 21, (B, 64, 64, 1)).astype(np.float32),
        "normals": r.uniform(-1, 1, (B, 64, 64, 3)).astype(np.float32),
        "sal": (r.rand(B, 64, 64, 1) > 0.5).astype(np.float32),
        "human_parts": r.randint(0, 7, (B, 64, 64, 1)).astype(np.float32),
    }


def meter_inputs(batch):
    """Deterministic fake semseg predictions derived from the targets."""
    import numpy as np

    gt = batch["semseg"][..., 0].astype(np.int32)
    bump = (np.arange(gt.size).reshape(gt.shape) % 3 == 0)
    pred = (gt + bump) % 21
    return pred, batch["semseg"]


def _barrier(name, timeout_ms=600_000):
    """Coordination-service barrier (not a device collective): keeps the
    processes' FIRST gloo collective near-simultaneous — gloo context
    init has a hard 30 s key-value timeout, which compile-time skew
    under host load can exceed."""
    try:
        from jax._src import distributed

        if distributed.global_state.client is not None:
            distributed.global_state.client.wait_at_barrier(
                name, timeout_ms)
    except Exception:
        pass


def compute():
    """One DP train step + meter reduction on the current jax topology.

    Works single-process (the in-test reference) and multi-process (the
    spawned workers); multi-process must call
    jax.distributed.initialize first.
    """
    import jax
    import jax.numpy as jnp

    from mtlora_tpu.evaluation.meters import SemsegMeter
    from mtlora_tpu.models.mtl import build_mtl_model
    from mtlora_tpu.parallel.distributed import (
        allreduce_meter_states, global_batch_from_local)
    from mtlora_tpu.parallel.mesh import (
        make_mesh, replicate_tree, shard_batch)
    from mtlora_tpu.train.optim import build_optimizer
    from mtlora_tpu.train.step import (
        TrainState, jit_train_step, make_train_step)

    ndev = len(jax.devices())
    world = jax.process_count()
    rank = jax.process_index()
    mesh = make_mesh([ndev])
    cfg = toy_config()
    model = build_mtl_model(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3), jnp.float32))
    tx = build_optimizer(cfg, variables["params"], n_iter_per_epoch=10)
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.PRNGKey(0))
    state = replicate_tree(state, mesh)

    gb = make_global_batch(ndev)
    B = gb["image"].shape[0]
    if world > 1:
        per = B // world
        local = {k: v[rank * per:(rank + 1) * per] for k, v in gb.items()}
        batch = global_batch_from_local(local, mesh)
    else:
        batch = shard_batch(gb, mesh)

    # global-batch checksum: a jitted global reduction over the sharded
    # arrays — equals the host-side sum over the full batch iff
    # global_batch_from_local assembled the shards in the right order
    chk = jax.jit(lambda b: jnp.sum(b["image"] ** 2) + jnp.sum(b["semseg"]))
    if world > 1:
        chk = chk.lower(batch).compile()
        _barrier("pre_chk")
    batch_chk = float(jax.device_get(chk(batch)))

    step = jit_train_step(make_train_step(model, tx, TASKS), mesh)
    if world > 1:
        # compile BEFORE the barrier so both processes reach the first
        # collective together regardless of compile-time skew
        step = step.lower(state, batch).compile()
        _barrier("pre_step")
    state, metrics = step(state, batch)
    loss = float(jax.device_get(metrics["loss"]))
    psum = jax.jit(lambda p: jax.tree.reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))), p, 0.0))
    param_sum = float(jax.device_get(psum(state.params)))

    # meter reduction across hosts (vs reference utils.py:324-328
    # defined-never-called)
    meter = SemsegMeter("PASCALContext")
    pred, gt = meter_inputs(gb)
    if world > 1:
        per = B // world
        sl = slice(rank * per, (rank + 1) * per)
        mstate = meter.update(meter.init(), jnp.asarray(pred[sl]),
                              jnp.asarray(gt[sl]))
        _barrier("pre_meters")
        mstate = allreduce_meter_states(mstate)
    else:
        mstate = meter.update(meter.init(), jnp.asarray(pred),
                              jnp.asarray(gt))
    miou = float(meter.compute(mstate)["mIoU"])

    return {"world": world, "rank": rank, "ndev": ndev,
            "batch_chk": batch_chk, "loss": loss,
            "param_sum": param_sum, "miou": miou}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    args = ap.parse_args()

    import jax

    # the environment's sitecustomize imports jax with the TPU platform
    # forced at interpreter start; override before first backend use
    jax.config.update("jax_platforms", "cpu")
    from mtlora_tpu.parallel.distributed import initialize

    initialize(args.coord, args.nproc, args.pid)
    print("RESULT " + json.dumps(compute()), flush=True)


if __name__ == "__main__":
    main()
