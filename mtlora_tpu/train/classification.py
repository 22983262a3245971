"""Legacy ImageNet classification training path (non-MTL).

The reference inherits a full classification trainer from Swin
(main.py:313-528 non-MTL branches: CrossEntropy / LabelSmoothing /
SoftTargetCrossEntropy with mixup, top-1/top-5 accuracy validation).
Rebuilt here as jitted steps over the same mesh machinery; datasets come
from ``mtlora_tpu.data.imagenet``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from mtlora_tpu.train.step import TrainState


def classification_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                        label_smoothing: float = 0.0) -> jnp.ndarray:
    """CE with int labels (optionally smoothed) or soft targets (mixup).

    Mirrors the reference criterion selection (main.py:180-188):
    soft targets when mixup produced [B, K]; smoothed CE otherwise.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if targets.ndim == logits.ndim:  # soft targets from mixup
        return -(targets * logp).sum(-1).mean()
    K = logits.shape[-1]
    if label_smoothing > 0:
        off = label_smoothing / K
        on = 1.0 - label_smoothing + off
        onehot = jax.nn.one_hot(targets.astype(jnp.int32), K) * (on - off) \
            + off
        return -(onehot * logp).sum(-1).mean()
    nll = -jnp.take_along_axis(
        logp, targets.astype(jnp.int32)[..., None], axis=-1)
    return nll.mean()


def accuracy_topk(logits: jnp.ndarray, labels: jnp.ndarray,
                  topk: Tuple[int, ...] = (1, 5)) -> Dict[str, jnp.ndarray]:
    """top-k accuracy (reference validate's acc1/acc5, main.py:439+)."""
    labels = labels.astype(jnp.int32)
    out = {}
    for k in topk:
        kk = min(k, logits.shape[-1])
        _, pred = jax.lax.top_k(logits, kk)
        correct = (pred == labels[:, None]).any(axis=-1)
        out[f"acc{k}"] = 100.0 * correct.mean()
    return out


def make_classification_train_step(model, tx: optax.GradientTransformation,
                                   label_smoothing: float = 0.1) -> Callable:
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            r1, r2 = jax.random.split(rng)
            logits = model.apply(
                {"params": params}, batch["image"], deterministic=False,
                rngs={"dropout": r1, "droppath": r2},
                return_stages=False, flatten_ft=True)
            return classification_loss(logits, batch["label"],
                                       label_smoothing)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), \
            {"loss": loss, "grad_norm": grad_norm}

    return train_step


def accuracy_topk_counts(logits: jnp.ndarray, labels: jnp.ndarray,
                         weight: jnp.ndarray = None,
                         topk: Tuple[int, ...] = (1, 5),
                         ) -> Dict[str, jnp.ndarray]:
    """top-k CORRECT COUNTS + weighted sample count — sum-accumulator
    form, so batches (and SPMD pad rows via 0 ``weight``) combine
    exactly; ``accuracy = 100 * correct / n`` on the host."""
    labels = labels.astype(jnp.int32)
    w = (jnp.ones(labels.shape[:1], jnp.float32) if weight is None
         else weight.astype(jnp.float32))
    out = {"n": w.sum()}
    for k in topk:
        kk = min(k, logits.shape[-1])
        _, pred = jax.lax.top_k(logits, kk)
        correct = (pred == labels[:, None]).any(axis=-1)
        out[f"correct{k}"] = (correct.astype(jnp.float32) * w).sum()
    return out


def make_classification_eval_step(model) -> Callable:
    def eval_step(params, images, labels, weight=None):
        logits = model.apply({"params": params}, images,
                             return_stages=False, flatten_ft=True)
        return accuracy_topk_counts(logits, labels, weight)

    return eval_step
