"""Per-task losses and the weighted multi-task loss.

Rebuild of reference ``mtl_loss_schemes.py`` with jit-safe, static-shape
formulations: every ``masked_select`` becomes a ``jnp.where`` + count
(SURVEY.md section 7.3 hard part 4). All reductions in float32.

Semantics preserved (reference file:line):
  - semseg/human_parts: softmax CE, ignore_index=255, mean over valid
    (SoftMaxwithLoss:22-39; NLLLoss default mean over non-ignored)
  - sal/edge: HED-balanced BCE-with-logits, size_average over ALL pixels
    (BalancedCrossEntropyLoss:42-90); edge uses fixed pos_weight 0.95
  - normals: L2-normalize pred, masked L1, sum / n_valid (NormalsLoss:162)
  - depth: masked L1 mean over valid (DepthLoss:132)
  - total = sum_t w_t * loss_t with fixed weights (main.py:192-199)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mtlora_tpu.data.task_config import LOSS_WEIGHTS


def softmax_ce_ignore(logits: jnp.ndarray, label: jnp.ndarray,
                      ignore_index: int = 255) -> jnp.ndarray:
    """Cross entropy with ignore label, mean over valid pixels.

    logits: [B, H, W, K] (NHWC); label: [B, H, W] or [B, H, W, 1] ints.
    """
    if label.ndim == logits.ndim:
        label = label[..., 0]
    label = label.astype(jnp.int32)
    valid = label != ignore_index
    safe = jnp.where(valid, label, 0)
    # nll = logsumexp(x) - x[label], via one-hot contraction: avoids
    # materializing a full [.., K] fp32 log-softmax (HBM-traffic win) and
    # keeps the backward scatter-free.
    x = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(x, axis=-1)
    K = logits.shape[-1]
    onehot = (safe[..., None]
              == jax.lax.broadcasted_iota(jnp.int32, (1,) * label.ndim
                                          + (K,), label.ndim))
    x_lab = jnp.sum(jnp.where(onehot, x, 0.0), axis=-1)
    nll = jnp.where(valid, lse - x_lab, 0.0)
    n = jnp.maximum(valid.sum(), 1)
    return nll.sum() / n


def balanced_bce_logits(logits: jnp.ndarray, label: jnp.ndarray,
                        pos_weight: Optional[float] = None,
                        row_weight: Optional[jnp.ndarray] = None,
                        ) -> jnp.ndarray:
    """HED-style class-balanced binary CE on logits.

    Matches BalancedCrossEntropyLoss.forward exactly, including its
    numerically-stable log1p(exp) form and division by the TOTAL element
    count (size_average=True), not the valid count. ``row_weight``
    (optional per-sample [B] 0/1): 0-weight rows (SPMD padding of a
    ragged final global batch) are excluded from every sum INCLUDING the
    total-element denominator, so the result equals the loss over the
    real rows alone.
    """
    x = logits.astype(jnp.float32)
    y = (label.astype(jnp.float32) >= 0.5).astype(jnp.float32)
    if row_weight is None:
        wrow = None
        num_total = jnp.asarray(y.size, jnp.float32)
    else:
        wrow = row_weight.astype(jnp.float32).reshape(
            (y.shape[0],) + (1,) * (y.ndim - 1))
        num_total = jnp.maximum(
            row_weight.astype(jnp.float32).sum()
            * (y.size // y.shape[0]), 1.0)
        y = y * wrow  # 0-weight rows count as neither pos nor neg below
    if pos_weight is None:
        num_pos = y.sum()
        w = (num_total - num_pos) / num_total
    else:
        w = pos_weight
    x_gt0 = (x >= 0).astype(jnp.float32)
    # log-sigmoid trick from the reference (mtl_loss_schemes.py:66-68)
    loss_val = x * (y - x_gt0) - jnp.log1p(jnp.exp(x - 2.0 * x * x_gt0))
    if wrow is not None:
        loss_val = loss_val * wrow
    loss_pos = -(y * loss_val).sum()
    loss_neg = -((1.0 - y) * loss_val).sum()
    final = w * loss_pos + (1.0 - w) * loss_neg
    return final / num_total


def normals_loss(pred: jnp.ndarray, label: jnp.ndarray,
                 ignore_label: int = 255) -> jnp.ndarray:
    """L2-normalized masked L1, sum / n_valid (NormalsLoss:187-206).

    pred/label: [B, H, W, 3]; mask is per-element (label != 255), matching
    the reference's element-wise masked_select.
    """
    p = pred.astype(jnp.float32)
    lbl = label.astype(jnp.float32)
    # normalize over channel axis, +1e-12 like reference Normalize:156
    norm = jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12
    p = p / norm
    mask = lbl != ignore_label
    diff = jnp.where(mask, jnp.abs(p - lbl), 0.0)
    n_valid = jnp.maximum(mask.sum(), 1)
    return diff.sum() / n_valid


def depth_loss(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Masked L1, mean over valid (DepthLoss:146-148)."""
    p = pred.astype(jnp.float32)
    lbl = label.astype(jnp.float32)
    mask = lbl != 255
    diff = jnp.where(mask, jnp.abs(p - lbl), 0.0)
    n = jnp.maximum(mask.sum(), 1)
    return diff.sum() / n


def get_task_loss(task: str):
    """Loss dispatch (reference get_loss, mtl_loss_schemes.py:241-263)."""
    if task in ("semseg", "human_parts"):
        return softmax_ce_ignore
    if task == "edge":
        return lambda p, l: balanced_bce_logits(p, l, pos_weight=0.95)
    if task == "sal":
        return balanced_bce_logits
    if task == "normals":
        return normals_loss
    if task == "depth":
        return depth_loss
    raise NotImplementedError(
        f"Undefined loss for task {task!r}; choose among "
        "edge, semseg, human_parts, sal, depth, normals")


def multi_task_loss(preds: Dict[str, jnp.ndarray],
                    targets: Dict[str, jnp.ndarray],
                    tasks,
                    loss_weights: Optional[Dict[str, float]] = None,
                    row_weight: Optional[jnp.ndarray] = None,
                    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum of per-task losses (MultiTaskLoss:223-238).

    Each per-task loss is rematerialized (jax.checkpoint): the losses
    cast full-resolution logits to fp32, and without remat autodiff
    saves those fp32 casts as backward residuals (539 MB for semseg at
    448/batch 32). Recomputing the elementwise loss forward in the
    backward pass saves ~1 GB of fp32 residual traffic per step.

    ``row_weight`` (per-sample [B] 0/1, eval padding): the mask-based
    losses are exact with ignore-filled padded targets already; the
    balanced-BCE losses (sal/edge) divide by the TOTAL element count, so
    they additionally take the weight to shrink their denominators.
    """
    weights = loss_weights or LOSS_WEIGHTS

    def one(t):
        if row_weight is not None and t in ("sal", "edge"):
            pw = 0.95 if t == "edge" else None
            fn = jax.checkpoint(
                lambda p, l, w, pw=pw: balanced_bce_logits(
                    p, l, pos_weight=pw, row_weight=w))
            return fn(preds[t], targets[t], row_weight)
        return jax.checkpoint(get_task_loss(t))(preds[t], targets[t])

    per_task = {t: one(t) for t in tasks}
    total = sum(weights[t] * per_task[t] for t in tasks)
    return total, per_task
