"""Train state + jitted train/eval steps.

The reference's entire hot-loop body (main.py:329-353: forward under
autocast, MultiTaskLoss, scaled backward, clip, AdamW step, scheduler
step) collapses into ONE jitted ``train_step(state, batch, rng)`` whose
inputs are sharded over the data mesh: params replicated, batch sharded;
XLA inserts the gradient all-reduce over ICI. On TPU the loss scaler is
unnecessary (bf16 has fp32 range) — grads are computed in fp32 params,
clipped by global norm (clip=5.0, utils.py:354-369), and metrics include
the pre-clip gradient norm like the reference logs.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mtlora_tpu.train.losses import multi_task_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array

    @classmethod
    def create(cls, *, params, tx, batch_stats=None, rng=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params),
                   batch_stats=batch_stats or {},
                   rng=rng if rng is not None else jax.random.PRNGKey(0))


def make_train_step(model, tx: optax.GradientTransformation, tasks,
                    loss_weights: Optional[Dict[str, float]] = None,
                    accum_steps: int = 1) -> Callable:
    """Build the jit-able train step.

    batch: {"image": [B,H,W,3]} + {task: target NHWC}.
    Returns (new_state, metrics) with per-task losses, total, grad_norm.
    With accum_steps > 1, the batch's leading axis is split into
    microbatches scanned sequentially (grad accumulation,
    reference main.py:347-353 + config.py:194).
    """
    tasks = tuple(tasks)

    def loss_fn(params, batch_stats, batch, rng):
        r1, r2 = jax.random.split(rng)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(
            variables, batch["image"], deterministic=False,
            rngs={"dropout": r1, "droppath": r2},
            mutable=["batch_stats"] if batch_stats else [])
        preds, mutated = out if isinstance(out, tuple) else (out, {})
        total, per_task = multi_task_loss(preds, batch, tasks, loss_weights)
        new_bs = mutated.get("batch_stats", batch_stats)
        return total, (per_task, new_bs)

    def single_grads(params, batch_stats, batch, rng):
        (total, (per_task, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch, rng)
        return grads, total, per_task, new_bs

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(state.rng, state.step)
        if accum_steps <= 1:
            grads, total, per_task, new_bs = single_grads(
                state.params, state.batch_stats, batch, rng)
        else:
            micro = jax.tree.map(
                lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), batch)

            def body(carry, mb_rng):
                acc, bs = carry
                mb, r = mb_rng
                g, t, pt, new_bs = single_grads(state.params, bs, mb, r)
                acc = jax.tree.map(jnp.add, acc, g)
                return (acc, new_bs), (t, pt)

            zero = jax.tree.map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, accum_steps)
            (gsum, new_bs), (totals, per_tasks) = jax.lax.scan(
                body, (zero, state.batch_stats),
                (micro, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            total = totals.mean()
            per_task = jax.tree.map(jnp.mean, per_tasks)

        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, "grad_norm": grad_norm,
                   **{f"loss_{t}": per_task[t] for t in tasks}}
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt, batch_stats=new_bs), metrics

    return train_step


def make_eval_step(model) -> Callable:
    """Forward in eval mode (deterministic, BN running stats);
    reference validate() forward at main.py:473."""

    def eval_step(params, batch_stats, images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, images, deterministic=True)

    return eval_step


def jit_train_step(train_step, mesh=None):
    """Jit with DP shardings: state replicated, batch sharded on 'data'."""
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    from mtlora_tpu.parallel.mesh import batch_sharding, replicated

    rep, shd = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, shd),
        out_shardings=(rep, rep),
        donate_argnums=(0,))


def jit_eval_step(eval_step, mesh=None):
    if mesh is None:
        return jax.jit(eval_step)
    from mtlora_tpu.parallel.mesh import batch_sharding, replicated

    rep, shd = replicated(mesh), batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(rep, rep, shd),
                   out_shardings=shd)
