"""Epoch driver: train_one_epoch / validate / throughput.

Rebuild of reference ``main.py:313-549`` around jitted steps: the whole
per-batch body (forward, loss, backward, clip, AdamW, schedule) is one
compiled ``train_step``; the host loop only feeds sharded batches and
logs. ``validate`` streams device-side meter updates (reference
main.py:439-528) and finalizes scores on host; ``throughput`` measures
synchronized img/s (the reference's harness is async-skewed,
main.py:540-545).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax

from mtlora_tpu.evaluation.meters import PerformanceMeter
from mtlora_tpu.parallel.mesh import shard_batch
from mtlora_tpu.train.losses import multi_task_loss
from mtlora_tpu.utils.logger import AverageMeter


def _device_batch(batch: Dict, mesh=None):
    batch = {k: v for k, v in batch.items() if "meta" not in k}
    if mesh is not None:
        if jax.process_count() > 1:
            # each process loaded its row block of the global batch
            # (DataLoader process partitioning); reassemble the global
            # sharded array across hosts
            from mtlora_tpu.parallel.distributed import (
                global_batch_from_local)

            return global_batch_from_local(batch, mesh)
        return shard_batch(batch, mesh)
    return jax.tree.map(jax.device_put, batch)


def train_one_epoch(config, state, train_step, loader, epoch: int,
                    mesh=None, logger=None, log_fn=None, eval_step=None):
    """One epoch (reference train_one_epoch main.py:313-436)."""
    num_steps = len(loader)
    batch_time = AverageMeter()
    loss_meter = AverageMeter()
    task_meters = {t: AverageMeter() for t in config.TASKS}
    norm_meter = AverageMeter()

    start = time.perf_counter()
    end = start
    metrics = None
    dev_batch = None
    metric_sums = None  # device-side running sums over EVERY step
    n_acc = 0
    last_sync = -1  # batch index of the previous hard sync
    for idx, batch in enumerate(loader.iter_epoch(epoch)):
        bsz = batch["image"].shape[0]
        dev_batch = _device_batch(batch, mesh)
        if idx == 0 and jax.process_count() > 1:
            # compile BEFORE the barrier so all processes reach the
            # first device collective together regardless of
            # compile-time skew (gloo context init hard-timeouts at
            # 30 s on CPU test meshes)
            from mtlora_tpu.parallel.distributed import barrier

            try:
                train_step.lower(state, dev_batch).compile()
            except AttributeError:
                pass
            barrier(f"train_epoch{epoch}")
        state, metrics = train_step(state, dev_batch)
        # every-step epoch averages accumulate ON DEVICE (lazy scalar
        # adds; no host sync) — the reference averages every batch
        # (main.py:355-366), and a PRINT_FREQ-subsampled average skews
        # the reported curves
        if metric_sums is None:
            metric_sums = dict(metrics)
        else:
            metric_sums = {k: metric_sums[k] + metrics[k]
                           for k in metric_sums}
        n_acc += 1
        # async dispatch: only sync for logging at PRINT_FREQ
        if idx % config.PRINT_FREQ == 0 or idx == num_steps - 1:
            metrics = jax.tree.map(float, jax.device_get(metrics))
            loss_meter.update(metrics["loss"], bsz)
            norm_meter.update(metrics["grad_norm"])
            # the sync drains all device work queued since the last sync,
            # i.e. idx - last_sync batches
            batch_time.update((time.perf_counter() - end)
                              / max(idx - last_sync, 1))
            last_sync = idx
            if logger:
                etas = batch_time.avg * (num_steps - idx)
                logger.info(
                    f"Train: [{epoch}/{config.TRAIN.EPOCHS}]"
                    f"[{idx}/{num_steps}] "
                    f"eta {etas:.0f}s "
                    f"loss {loss_meter.val:.4f} ({loss_meter.avg:.4f}) "
                    f"grad_norm {norm_meter.val:.4f}")
            if log_fn:
                log_fn({"train/loss": metrics["loss"],
                        "train/grad_norm": metrics["grad_norm"],
                        **{f"train/loss_{t}": metrics[f"loss_{t}"]
                           for t in config.TASKS},
                        "epoch": epoch, "step": idx})
        end = time.perf_counter()
    if metric_sums is not None:
        # ONE host sync for the exact epoch averages
        sums = jax.tree.map(float, jax.device_get(metric_sums))
        loss_meter = AverageMeter()
        loss_meter.update(sums["loss"] / n_acc, n_acc)
        for t in config.TASKS:
            task_meters[t].update(sums[f"loss_{t}"] / n_acc, n_acc)
    # training-set eval on the last batch every EVAL_TRAINING epochs
    # (reference main.py:403-412)
    eval_training = config.get("EVAL_TRAINING", None)
    if (eval_training and eval_step is not None and dev_batch is not None
            and epoch % eval_training == 0):
        meter = PerformanceMeter(list(config.TASKS), config.DATA.DBNAME)
        preds = eval_step(state.params, state.batch_stats,
                          dev_batch["image"])
        meter.states = jax.device_get(meter.update_jit(
            meter.states, preds, {t: dev_batch[t] for t in config.TASKS}))
        scores = meter.get_score(verbose=logger is not None)
        if log_fn:
            log_fn(_score_logs(scores, epoch, prefix="train_eval"))
    if logger:
        logger.info(f"EPOCH {epoch} training takes "
                    f"{time.perf_counter() - start:.1f}s")
    return state, {"loss": loss_meter.avg,
                   **{t: task_meters[t].avg for t in config.TASKS}}


def _score_logs(scores, epoch, prefix="val"):
    """wandb metric schema of the reference (main.py:503-526):
    {prefix}/tasks/{task}/{metric}."""
    logs = {f"{prefix}/epoch": epoch}
    keymap = {
        "semseg": ("mIoU",),
        "normals": ("mean", "rmse", "mean_v2", "rmse_v2"),
        "human_parts": ("mIoU",),
        "sal": ("maxF", "Beta maxF", "mIoU"),
        "edge": ("loss",),
        "depth": ("rmse", "log_rmse"),
    }
    for task, res in scores.items():
        for m in keymap.get(task, ()):
            if m in res:
                logs[f"{prefix}/tasks/{task}/{m}"] = res[m]
    return logs


def validate(config, state, eval_step, loader, epoch: int = 0, mesh=None,
             logger=None, log_fn=None, update_jit=None):
    """Full validation pass (reference validate main.py:439-528):
    streaming meters + per-task eval losses."""
    import jax.numpy as jnp

    tasks = list(config.TASKS)
    meter = PerformanceMeter(tasks, config.DATA.DBNAME)

    if update_jit is None:
        # ONE jitted device-side update per batch: meter states AND the
        # per-task eval losses accumulate on device; the host syncs once
        # after the loop (the reference round-trips per batch,
        # main.py:466-476). ``weight`` is either the scalar batch size
        # or a per-sample [B] 0/1 validity mask (pad_last loaders): pad
        # rows contribute exactly nothing to meters or losses.
        @jax.jit
        def update_jit(states, loss_sums, preds, targets, weight):
            wrow = weight if jnp.ndim(weight) else None
            new_states = meter.update_jit(states, preds, targets, wrow)
            total, per_task = multi_task_loss(preds, targets, tasks,
                                              row_weight=wrow)
            n = weight.sum() if wrow is not None else weight
            new_sums = {t: loss_sums[t] + per_task[t] * n
                        for t in tasks}
            new_sums["_n"] = loss_sums["_n"] + n
            return new_states, new_sums, {"total": total, **per_task}

    # opt-in reference per-batch wandb series (ref main.py:485-495);
    # costs one host sync per batch, hence default off
    step_val = bool(config.get("WANDB_STEP_VAL", False)) and log_fn
    step_loss_meter = AverageMeter()
    states = meter.states
    loss_sums = {t: jnp.zeros(()) for t in tasks}
    loss_sums["_n"] = jnp.zeros(())
    first = True
    for bidx, batch in enumerate(loader.iter_epoch(0)):
        bsz = batch["image"].shape[0]
        dev_batch = _device_batch(batch, mesh)
        if first and jax.process_count() > 1:
            from mtlora_tpu.parallel.distributed import barrier

            try:
                eval_step.lower(state.params, state.batch_stats,
                                dev_batch["image"]).compile()
            except AttributeError:
                pass
            barrier(f"validate_e{epoch}")
            first = False
        preds = eval_step(state.params, state.batch_stats,
                          dev_batch["image"])
        targets = {t: dev_batch[t] for t in tasks}
        weight = dev_batch.get("_valid", float(bsz))
        out = update_jit(states, loss_sums, preds, targets, weight)
        states, loss_sums = out[0], out[1]
        if step_val and len(out) > 2:
            batch_losses = jax.tree.map(float, jax.device_get(out[2]))
            step_loss_meter.update(batch_losses["total"])
            log_fn({"val/epoch_ndx": epoch, "val/batch_ndx": bidx,
                    "val/val_loss": step_loss_meter.val,
                    "val/val_loss_avg": step_loss_meter.avg,
                    **{f"val/tasks/{t}/loss": batch_losses[t]
                       for t in tasks}})
    # NOTE: no cross-host allreduce here — update_jit consumed GLOBAL
    # sharded batches (SPMD), so `states` is already the global sum,
    # replicated on every process. allreduce_meter_states remains for
    # host-side local-update patterns (e.g. evaluation/offline.py).
    meter.states = jax.device_get(states)
    loss_sums = jax.device_get(loss_sums)
    n = max(float(loss_sums["_n"]), 1.0)
    loss_avgs = {t: float(loss_sums[t]) / n for t in tasks}
    scores = meter.get_score(verbose=logger is not None)
    if logger:
        for t in tasks:
            logger.info(f"val loss {t}: {loss_avgs[t]:.4f}")
    if log_fn:
        flat = _score_logs(scores, epoch, prefix="val")
        for t in tasks:
            flat[f"val/loss_{t}"] = loss_avgs[t]
        log_fn(flat)
    return scores


def throughput(config, state, eval_step, loader=None, mesh=None,
               logger=None, batch=None, warmup: int = 50, timed: int = 30,
               label=None):
    """Synchronized forward throughput (reference main.py:531-549 with
    the missing device syncs fixed)."""
    if batch is None:
        batch = next(iter(loader.iter_epoch(0)))
    dev_batch = _device_batch(batch, mesh)
    images = dev_batch["image"]
    B = images.shape[0]
    def _hard_sync(out):
        # block_until_ready can return early on the experimental axon
        # platform; a host fetch of one scalar is the reliable barrier
        # (same methodology as bench.py)
        float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))

    for _ in range(warmup):
        out = eval_step(state.params, state.batch_stats, images)
    _hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(timed):
        out = eval_step(state.params, state.batch_stats, images)
    _hard_sync(out)
    dt = time.perf_counter() - t0
    rate = timed * B / dt
    if logger:
        # say WHICH forward was measured: by default eval clones run
        # fp32 with the Pallas kernels disabled (reference outside-
        # autocast parity; models/mtl.py:eval_model_for) — ~3x slower
        # than the bf16 production eval path (TPU.EVAL_DTYPE bfloat16)
        dtype = "bfloat16" if (config is not None and str(
            config.get("TPU", {}).get("EVAL_DTYPE", "float32"))
            == "bfloat16") else "float32"
        path = label or (
            "bf16 + Pallas kernels (production eval path)"
            if dtype == "bfloat16" else
            "fp32, Pallas kernels disabled (reference eval-parity "
            "path; set TPU.EVAL_DTYPE bfloat16 for the fast path)")
        logger.info(f"batch_size {B} throughput {rate:.1f} img/s "
                    f"[measured: {path}]")
    return rate
