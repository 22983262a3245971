"""Optimizer, LR schedules, weight-decay and trainability masking.

Rebuild of reference ``optimizer.py`` + ``lr_scheduler.py`` +
``models/lora.py:580-630`` (``mark_only_lora_as_trainable``) as optax
transforms:

  - AdamW (default) / SGD-nesterov, eps/betas/momentum from config
    (optimizer.py:52-63);
  - no weight decay for 1-D params, biases, ``absolute_pos_embed``,
    ``relative_position_bias_table`` (optimizer.py:71-85 + the model's
    no_weight_decay sets);
  - step-wise timm-parity schedules: cosine (warmup-prefix), linear,
    step, multistep (lr_scheduler.py:25-74);
  - trainability = LoRA-freeze semantics as a ``multi_transform`` whose
    frozen partition gets ``set_to_zero`` — frozen weights never change
    and their optimizer state is empty (TPU memory win vs torch's
    requires_grad=False which still allocates grads);
  - linear LR scaling by batch*world/512 and accumulation steps
    (main.py:578-592);
  - gradient clipping by global norm 5.0 on the trainable partition
    (utils.py:354-369, config.py:189).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# Schedules (timm step-wise parity)
# ---------------------------------------------------------------------------

def cosine_schedule(base_lr, warmup_lr, min_lr, warmup_steps, total_steps,
                    warmup_prefix=True):
    """timm CosineLRScheduler, t_in_epochs=False, cycle_limit=1
    (lr_scheduler.py:34-45)."""
    t_initial = (total_steps - warmup_steps) if warmup_prefix else total_steps

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step * (
            (base_lr - warmup_lr) / max(warmup_steps, 1))
        t = step - warmup_steps if warmup_prefix else step
        t = jnp.minimum(t, t_initial)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(math.pi * t / max(t_initial, 1)))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def linear_schedule(base_lr, warmup_lr, warmup_steps, total_steps,
                    lr_min_rate=0.01):
    """timm-style LinearLRScheduler (lr_scheduler.py:77-128)."""
    total_t = max(total_steps - warmup_steps, 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step * (
            (base_lr - warmup_lr) / max(warmup_steps, 1))
        t = jnp.clip(step - warmup_steps, 0, total_t)
        lin = base_lr - (base_lr - base_lr * lr_min_rate) * (t / total_t)
        return jnp.where(step < warmup_steps, warm, lin)

    return fn


def step_schedule(base_lr, warmup_lr, warmup_steps, decay_steps, decay_rate):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step * (
            (base_lr - warmup_lr) / max(warmup_steps, 1))
        n = jnp.floor((step - warmup_steps) / max(decay_steps, 1))
        dec = base_lr * decay_rate ** jnp.maximum(n, 0)
        return jnp.where(step < warmup_steps, warm, dec)

    return fn


def multistep_schedule(base_lr, warmup_lr, warmup_steps, milestones, gamma):
    milestones = jnp.asarray(sorted(milestones), jnp.float32) \
        if len(milestones) else jnp.zeros((0,), jnp.float32)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + step * (
            (base_lr - warmup_lr) / max(warmup_steps, 1))
        n = jnp.sum(step >= milestones) if milestones.size else 0
        dec = base_lr * gamma ** n
        return jnp.where(step < warmup_steps, warm, dec)

    return fn


def scaled_lrs(config, world_size: int = 1) -> Tuple[float, float, float]:
    """Linear LR scaling by batch*world/512 (+accumulation), main.py:578-592."""
    scale = config.DATA.BATCH_SIZE * world_size / 512.0
    if config.TRAIN.ACCUMULATION_STEPS > 1:
        scale *= config.TRAIN.ACCUMULATION_STEPS
    return (config.TRAIN.BASE_LR * scale,
            config.TRAIN.WARMUP_LR * scale,
            config.TRAIN.MIN_LR * scale)


def build_schedule(config, n_iter_per_epoch: int,
                   world_size: int = 1) -> Callable:
    """Schedule dispatch (lr_scheduler.py:25-74) with LR scaling applied."""
    base_lr, warmup_lr, min_lr = scaled_lrs(config, world_size)
    accum = max(config.TRAIN.ACCUMULATION_STEPS, 1)
    n_eff = n_iter_per_epoch // accum if accum > 1 else n_iter_per_epoch
    num_steps = int(config.TRAIN.EPOCHS * n_eff)
    warmup_steps = int(config.TRAIN.WARMUP_EPOCHS * n_eff)
    name = config.TRAIN.LR_SCHEDULER.NAME
    if name == "cosine":
        return cosine_schedule(
            base_lr, warmup_lr, min_lr, warmup_steps, num_steps,
            warmup_prefix=bool(config.TRAIN.LR_SCHEDULER.WARMUP_PREFIX))
    if name == "linear":
        return linear_schedule(base_lr, warmup_lr, warmup_steps, num_steps)
    if name == "step":
        decay_steps = int(
            config.TRAIN.LR_SCHEDULER.DECAY_EPOCHS * n_eff)
        return step_schedule(base_lr, warmup_lr, warmup_steps, decay_steps,
                             config.TRAIN.LR_SCHEDULER.DECAY_RATE)
    if name == "multistep":
        ms = [int(m * n_eff) for m in config.TRAIN.LR_SCHEDULER.MULTISTEPS]
        return multistep_schedule(base_lr, warmup_lr, warmup_steps, ms,
                                  config.TRAIN.LR_SCHEDULER.GAMMA)
    raise NotImplementedError(f"scheduler {name}")


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    return "/".join(str(p) for p in path)


def no_weight_decay_mask(params):
    """True -> apply weight decay (optimizer.py:71-85 inverted)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, val in flat.items():
        p = _path_str(path)
        no_decay = (val.ndim <= 1
                    or path[-1] == "bias"
                    or "absolute_pos_embed" in p
                    or "relative_position_bias_table" in p)
        out[path] = not no_decay
    return flax.traverse_util.unflatten_dict(out)


def lora_trainable_mask(params, config):
    """mark_only_lora_as_trainable semantics (models/lora.py:580-630).

    Backbone params are trainable iff they pass the LoRA filters; all
    non-backbone params (downsamplers, decoders) stay trainable
    (main.py:254-262 applies freezing to model.backbone only).
    Returns a pytree of bools (True = trainable).
    """
    import flax

    mtlora = config.MODEL.MTLORA
    if config.MODEL.FREEZE_BACKBONE:
        assert not mtlora.ENABLED
    freeze_pe = bool(config.TRAIN.FREEZE_PATCH_EMBED)
    freeze_norm = bool(config.TRAIN.FREEZE_LAYER_NORM)
    freeze_rel = bool(config.TRAIN.FREEZE_RELATIVE_POSITION_BIAS)
    # quirk preserved: with DOWNSAMPLER_ENABLED the reduction is force-
    # frozen (its LoRA adapters still train) — main.py:267
    freeze_red = (True if mtlora.DOWNSAMPLER_ENABLED
                  else bool(config.TRAIN.FREEZE_DOWNSAMPLE_REDUCTION))
    bias_mode = mtlora.BIAS

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, _ in flat.items():
        if path[0] != "backbone":
            out[path] = True
            continue
        if config.MODEL.FREEZE_BACKBONE:
            out[path] = False
            continue
        if not (mtlora.ENABLED and mtlora.FREEZE_PRETRAINED):
            out[path] = True
            continue
        p = _path_str(path)
        is_reduction = ("downsample" in p and "reduction" in p)
        trainable = (
            any(seg.startswith("lora_") for seg in path)
            or (not freeze_pe and "patch_embed" in p)
            or (not freeze_norm and "norm" in p)
            or (not freeze_red and is_reduction)
            or (not freeze_rel and "relative_position_bias_table" in p))
        if bias_mode == "all" and path[-1] == "bias":
            trainable = True
        out[path] = trainable
    return flax.traverse_util.unflatten_dict(out)


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------

def build_optimizer(config, params, n_iter_per_epoch: int,
                    world_size: int = 1,
                    schedule: Optional[Callable] = None
                    ) -> optax.GradientTransformation:
    """AdamW/SGD with clip, wd-mask, trainability-mask, schedule.

    Frozen params get set_to_zero (no state allocated).
    """
    import jax

    if schedule is None:
        schedule = build_schedule(config, n_iter_per_epoch, world_size)
    wd_mask = no_weight_decay_mask(params)
    name = config.TRAIN.OPTIMIZER.NAME.lower()
    wd = config.TRAIN.WEIGHT_DECAY
    if name == "adamw":
        opt = optax.adamw(
            learning_rate=schedule,
            b1=float(config.TRAIN.OPTIMIZER.BETAS[0]),
            b2=float(config.TRAIN.OPTIMIZER.BETAS[1]),
            eps=float(config.TRAIN.OPTIMIZER.EPS),
            weight_decay=wd, mask=wd_mask)
    elif name == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(wd, mask=wd_mask),
            optax.sgd(learning_rate=schedule,
                      momentum=float(config.TRAIN.OPTIMIZER.MOMENTUM),
                      nesterov=True))
    else:
        raise NotImplementedError(f"optimizer {name}")

    clip = config.TRAIN.CLIP_GRAD
    if clip:
        opt = optax.chain(optax.clip_by_global_norm(float(clip)), opt)

    trainable = lora_trainable_mask(params, config)
    labels = jax.tree.map(lambda t: "trainable" if t else "frozen", trainable)
    return optax.multi_transform(
        {"trainable": opt, "frozen": optax.set_to_zero()}, labels)


def freeze_component_mask(params, *, freeze_backbone=False,
                          freeze_tasks=()):
    """Trainability mask for the reference's freeze helpers
    (MultiTaskSwin.freeze_backbone / freeze_task, swin_mtl.py:248-270):
    True = trainable. Compose with lora_trainable_mask via logical AND."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    frozen_decoders = {f"decoder_{t}" for t in freeze_tasks}
    for path, _ in flat.items():
        trainable = True
        if freeze_backbone and path[0] == "backbone":
            trainable = False
        if path[0] in frozen_decoders:
            trainable = False
        out[path] = trainable
    return flax.traverse_util.unflatten_dict(out)


def count_params(params, config=None):
    """Parameter accounting printout data (reference main.py:269-285)."""
    import flax
    import numpy as np

    flat = flax.traverse_util.flatten_dict(params)
    total = sum(int(np.prod(v.shape)) for v in flat.values())
    lora = sum(int(np.prod(v.shape)) for k, v in flat.items()
               if any("lora" in s for s in k))
    decoder = sum(int(np.prod(v.shape)) for k, v in flat.items()
                  if k[0] != "backbone")
    out = {"total": total, "lora": lora, "decoder": decoder}
    if config is not None:
        mask = lora_trainable_mask(params, config)
        fmask = flax.traverse_util.flatten_dict(mask)
        out["trainable"] = sum(int(np.prod(v.shape))
                               for k, v in flat.items() if fmask[k])
        out["extra"] = out["trainable"] - (lora + decoder)
    return out
