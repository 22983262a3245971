"""Torch checkpoint -> JAX variables converter.

One-shot implementation of the reference's checkpoint key surgery
(``utils.py:41-277`` + ``models/lora.py:644-668``):
  - strips ``attn_mask`` / ``relative_position_index`` buffers
    (utils.py:60-62, 186-201) — trace-time constants here;
  - accepts both plain ``qkv.weight`` (vanilla Swin / CompatLinear) and
    LoRA-wrapped ``qkv.linear.weight`` keys — the ``.linear.`` remap of
    utils.py:125-149 is a no-op in this layout since both land on the
    same flax ``kernel``;
  - stacks per-task ``lora_tasks_A.{task}`` dict entries into the
    task-stacked ``[T, in, r]`` arrays (padding ranks to max);
  - bicubic-resizes ``relative_position_bias_table`` between window sizes
    and ``absolute_pos_embed`` between image sizes (utils.py:203-248);
  - maps torch Conv/Linear/BatchNorm layouts to flax (kernel transposes,
    ``weight``->``scale``, running stats -> ``batch_stats``).

Works for three checkpoint families:
  1. official ImageNet Swin checkpoints (backbone only, no prefix),
  2. reference MTLoRA full-model checkpoints (``backbone.`` prefix,
     downsampler + decoders),
  3. backbone-only resumes.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _t(x):
    return np.asarray(x)


def resize_rel_pos_bias_table(table: np.ndarray, new_len: int) -> np.ndarray:
    """Bicubic-resize a [(2w1-1)^2, nH] table to [(2w2-1)^2, nH]
    (reference utils.py:203-221)."""
    L1, nH = table.shape
    if L1 == new_len:
        return table
    S1 = int(round(np.sqrt(L1)))
    S2 = int(round(np.sqrt(new_len)))
    grid = table.reshape(S1, S1, nH)
    out = jax.image.resize(jnp.asarray(grid), (S2, S2, nH), method="bicubic")
    return np.asarray(out).reshape(S2 * S2, nH)


def resize_abs_pos_embed(pe: np.ndarray, new_len: int) -> np.ndarray:
    """Bicubic-resize [1, L1, C] absolute positions to [1, L2, C]
    (reference utils.py:223-248)."""
    _, L1, C = pe.shape
    if L1 == new_len:
        return pe
    S1 = int(round(np.sqrt(L1)))
    S2 = int(round(np.sqrt(new_len)))
    grid = pe.reshape(S1, S1, C)
    out = jax.image.resize(jnp.asarray(grid), (S2, S2, C), method="bicubic")
    return np.asarray(out).reshape(1, S2 * S2, C)


_SKIP_PATTERNS = (
    re.compile(r"\battn_mask$"),
    re.compile(r"relative_position_index$"),
    re.compile(r"num_batches_tracked$"),
    re.compile(r"\bavgpool"),
)

# vendored reference data/map22kto1k.txt (1000 IN-22K class indices)
DEFAULT_MAP22K = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "data",
    "map22kto1k.txt")


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    tasks: Sequence[str] = (),
    *,
    target_window_size: Optional[int] = None,
    target_num_patches: Optional[int] = None,
    skip_decoder: bool = False,
    num_classes: int = 0,
    map22k_path: str = DEFAULT_MAP22K,
    verbose: bool = False,
) -> Dict[str, Dict]:
    """Convert a torch state_dict to flax ``{"params":..., "batch_stats":...}``.

    Handles backbone-only checkpoints (official Swin; keys have no
    ``backbone.`` prefix — one is added) and full MTL checkpoints.
    ``skip_decoder`` mirrors ``--skip_decoder`` (utils.py:54-57).
    """
    tasks = list(tasks)
    params: Dict = {}
    batch_stats: Dict = {}
    # task adapter collection: flax-prefix -> {task: array}
    task_stacks: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}
    unmapped = []

    def is_backbone_only(sd):
        return not any(k.startswith(("backbone.", "decoders.", "downsampler."))
                       for k in sd)

    add_prefix = is_backbone_only(state_dict)
    head_raw: Dict[str, np.ndarray] = {}

    for key, raw in state_dict.items():
        val = _t(raw)
        if any(p.search(key) for p in _SKIP_PATTERNS):
            continue
        k = ("backbone." + key) if add_prefix else key
        if re.search(r"(^|\.)head\.(weight|bias)$", k):
            # classification head: dropped in MTL mode (reference
            # config.py:412 -> Identity head); kept/remapped/zeroed for
            # classification per utils.py:250-269
            if num_classes > 0:
                head_raw[k.rsplit(".", 1)[-1]] = val
            continue
        if skip_decoder and (k.startswith("decoders.")
                             or k.startswith("downsampler.")):
            continue
        if k.startswith("decoders."):
            dest = _convert_decoder_key(k, val, params, batch_stats)
            if dest is None:
                unmapped.append(key)
            continue
        if k.startswith("downsampler."):
            # downsampler.{task}.downsample_{s}.weight [ch, dim, 1, 1]
            m = re.match(r"downsampler\.([^.]+)\.downsample_(\d)\.weight$", k)
            if not m:
                unmapped.append(key)
                continue
            task, s = m.group(1), m.group(2)
            w = val[:, :, 0, 0].T  # -> [dim, ch]
            task_stacks.setdefault(("downsampler", f"scale_{s}"),
                                   {})[task] = w
            continue

        # ---- backbone ----
        parts = k.split(".")
        out_path, value = _convert_backbone_key(parts, val)
        if out_path is None:
            unmapped.append(key)
            continue
        if out_path[-1] == "__task_stack__":
            # (..., 'lora_tasks_A', task) marker
            prefix, leaf, task = out_path[:-3], out_path[-3], out_path[-2]
            task_stacks.setdefault(prefix + (leaf,), {})[task] = value
            continue
        if out_path[-1] == "relative_position_bias_table" and \
                target_window_size is not None:
            value = resize_rel_pos_bias_table(
                value, (2 * target_window_size - 1) ** 2)
        if out_path[-1] == "absolute_pos_embed" and \
                target_num_patches is not None:
            value = resize_abs_pos_embed(value, target_num_patches)
        _set(params, out_path, jnp.asarray(value))

    if num_classes > 0 and "weight" in head_raw:
        # head surgery (reference utils.py:250-269): keep on class-count
        # match; select 1K rows via map22kto1k on a 22K head; otherwise
        # re-init to zero (the reference's constant_(0.) fallback)
        w, b = head_raw["weight"], head_raw.get("bias")
        nc_ckpt = w.shape[0]
        if nc_ckpt == num_classes:
            kernel, bias = w.T, b
        elif nc_ckpt == 21841 and num_classes == 1000:
            with open(map22k_path) as f:
                idx = [int(line.strip()) for line in f if line.strip()]
            kernel, bias = w[idx].T, (b[idx] if b is not None else None)
        else:
            kernel = np.zeros((w.shape[1], num_classes), w.dtype)
            bias = np.zeros((num_classes,), w.dtype)
            if verbose:
                print(f"[torch_convert] head {nc_ckpt} != {num_classes}: "
                      "re-initialized to zero (utils.py:264-269)")
        _set(params, ("backbone", "head", "kernel"), jnp.asarray(kernel))
        if bias is not None:
            _set(params, ("backbone", "head", "bias"), jnp.asarray(bias))

    # assemble task stacks (pad ranks to max, matching MTLoRALinear layout)
    for prefix, stack in task_stacks.items():
        if prefix[-1].endswith("_A"):
            # torch [r, in] -> jax [in, r]; stack -> [T, in, r_max]
            mats = [stack[t].T for t in tasks if t in stack]
            r_max = max(m.shape[1] for m in mats)
            mats = [np.pad(m, ((0, 0), (0, r_max - m.shape[1])))
                    for m in mats]
        elif prefix[-1].endswith("_B"):
            # torch [out, r] -> jax [r, out]; stack -> [T, r_max, out]
            mats = [stack[t].T for t in tasks if t in stack]
            r_max = max(m.shape[0] for m in mats)
            mats = [np.pad(m, ((0, r_max - m.shape[0]), (0, 0)))
                    for m in mats]
        elif prefix[-1] == "lora_task_scale":
            mats = [stack[t].reshape(()) for t in tasks if t in stack]
        else:  # downsampler scales: [dim, ch] each
            mats = [stack[t] for t in tasks if t in stack]
        _set(params, prefix, jnp.asarray(np.stack(mats)))

    if verbose and unmapped:
        print(f"[torch_convert] unmapped keys: {unmapped}")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _convert_backbone_key(parts, val):
    """Translate one backbone torch key into (flax_path, value)."""
    # normalize: layers.{i} -> layers_{i}, blocks.{j} -> blocks_{j}
    path = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("layers", "blocks") and i + 1 < len(parts) and \
                parts[i + 1].isdigit():
            path.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            path.append(p)
            i += 1
    leaf = path[-1]
    parent = path[-2] if len(path) >= 2 else ""

    # LoRA-wrapped linear: '.linear.weight' -> kernel (the utils.py:125-149
    # key remap collapses here)
    if parent == "linear":
        base = tuple(path[:-2])
        if leaf == "weight":
            return base + ("kernel",), val.T
        if leaf == "bias":
            return base + ("bias",), val
    if leaf == "weight" and val.ndim == 2 and \
            parent in ("qkv", "proj", "fc1", "fc2", "reduction", "head"):
        return tuple(path[:-1]) + ("kernel",), val.T
    if leaf == "bias" and parent in ("qkv", "proj", "fc1", "fc2",
                                     "reduction", "head"):
        return tuple(path), val
    if parent.startswith("norm") or parent == "norm":
        base = tuple(path[:-1])
        if leaf == "weight":
            return base + ("scale",), val
        if leaf == "bias":
            return base + ("bias",), val
    if leaf in ("weight", "bias") and parent == "proj" and \
            val.ndim == 4:  # patch_embed conv [C, 3, k, k]
        base = tuple(path[:-1])
        if leaf == "weight":
            return base + ("kernel",), val.transpose(2, 3, 1, 0)
        return base + ("bias",), val
    if "patch_embed" in path and parent == "proj":
        base = tuple(path[:-1])
        if leaf == "weight":
            if val.ndim == 4:
                return base + ("kernel",), val.transpose(2, 3, 1, 0)
            return base + ("kernel",), val.T
        if leaf == "bias":
            return base + ("bias",), val
    if leaf == "relative_position_bias_table":
        return tuple(path), val
    if leaf == "absolute_pos_embed":
        return tuple(path), val
    if leaf == "lora_shared_A":
        return tuple(path[:-1]) + ("lora_shared_A",), val.T
    if leaf == "lora_shared_B":
        return tuple(path[:-1]) + ("lora_shared_B",), val.T
    if leaf == "lora_shared_scale":
        return tuple(path), val.reshape(1)
    if parent in ("lora_tasks_A", "lora_tasks_B", "lora_task_scale"):
        # path ends (..., lora_tasks_A, {task}); marker for stacking
        return tuple(path) + ("__task_stack__",), val
    # lora_norm (addition mode LayerNorm)
    if parent == "lora_norm":
        base = tuple(path[:-1])
        if leaf == "weight":
            return base + ("scale",), val
        if leaf == "bias":
            return base + ("bias",), val
    return None, None


def _convert_decoder_key(k, val, params, batch_stats):
    """decoders.{task}.last_layer.{idx}.{leaf} (HRNet head;
    seg_hrnet.py:502-515) -> decoder_{task}/{expand|pred}/..."""
    m = re.match(r"decoders\.(?:decoders\.)?([^.]+)\.last_layer\.(\d)\.(.+)$",
                 k)
    if not m:
        return None
    task, idx, leaf = m.group(1), int(m.group(2)), m.group(3)
    base = (f"decoder_{task}",)
    if idx == 0:  # expand conv
        if leaf == "weight":
            _set(params, base + ("expand", "conv", "kernel"),
                 jnp.asarray(val.transpose(2, 3, 1, 0)))
        else:
            _set(params, base + ("expand", "conv", "bias"), jnp.asarray(val))
    elif idx == 1:  # expand BN
        if leaf == "weight":
            _set(params, base + ("expand", "bn", "scale"), jnp.asarray(val))
        elif leaf == "bias":
            _set(params, base + ("expand", "bn", "bias"), jnp.asarray(val))
        elif leaf == "running_mean":
            _set(batch_stats, base + ("expand", "bn", "mean"),
                 jnp.asarray(val))
        elif leaf == "running_var":
            _set(batch_stats, base + ("expand", "bn", "var"),
                 jnp.asarray(val))
    elif idx == 3:  # prediction conv
        if leaf == "weight":
            _set(params, base + ("pred", "kernel"),
                 jnp.asarray(val.transpose(2, 3, 1, 0)))
        else:
            _set(params, base + ("pred", "bias"), jnp.asarray(val))
    else:
        return None
    return True


def remap_22k_to_1k_head(kernel: np.ndarray, bias: np.ndarray,
                         map_file: str):
    """Select the 1K-class rows of a 22K classification head using a
    map file of 1000 class indices, one per line (-1 -> zero row) —
    reference utils.py:250-269 + data/map22kto1k.txt."""
    with open(map_file) as f:
        idx = [int(line.strip()) for line in f if line.strip()]
    out_k = np.zeros((kernel.shape[0], len(idx)), kernel.dtype)
    out_b = np.zeros((len(idx),), bias.dtype)
    for j, i in enumerate(idx):
        if i >= 0:
            out_k[:, j] = kernel[:, i]
            out_b[j] = bias[i]
    return out_k, out_b


def merge_converted(variables, converted, *, strict: bool = False,
                    verbose: bool = True):
    """Overlay converted torch weights onto freshly-initialized variables.

    Prints missing/unexpected keys like reference utils.py:150-159.
    """
    import flax

    flat_init = flax.traverse_util.flatten_dict(variables)
    flat_new = flax.traverse_util.flatten_dict(converted)
    merged = dict(flat_init)
    loaded, missing, unexpected = 0, [], []
    for k, v in flat_new.items():
        if k in merged:
            if merged[k].shape != v.shape:
                if k[-1] == "relative_position_bias_table":
                    # per-block window clamping (blocks whose resolution
                    # is below the global window size use smaller tables;
                    # swin_transformer_mtlora.py:279-282) — bicubic-resize
                    # to the target block's table like utils.py:203-221
                    v = jnp.asarray(resize_rel_pos_bias_table(
                        np.asarray(v), merged[k].shape[0]))
                elif k[-1] == "absolute_pos_embed":
                    v = jnp.asarray(resize_abs_pos_embed(
                        np.asarray(v), merged[k].shape[1]))
                else:
                    raise ValueError(
                        f"shape mismatch at {'/'.join(k)}: "
                        f"init {merged[k].shape} vs ckpt {v.shape}")
            merged[k] = v.astype(merged[k].dtype)
            loaded += 1
        else:
            unexpected.append("/".join(k))
    for k in flat_init:
        if k not in flat_new:
            missing.append("/".join(k))
    if verbose:
        print(f"[torch_convert] loaded {loaded} tensors; "
              f"{len(missing)} missing (kept init), "
              f"{len(unexpected)} unexpected (dropped)")
    if strict and (missing or unexpected):
        raise ValueError(f"missing={missing}, unexpected={unexpected}")
    return flax.traverse_util.unflatten_dict(merged)


def strip_backbone_prefix(converted: Dict[str, Dict]) -> Dict[str, Dict]:
    """Re-root converted trees at the ``backbone`` subtree for bare-backbone
    models (classification mode builds the backbone directly, so its param
    tree has no ``backbone`` wrapper)."""
    return {col: tree.get("backbone", tree)
            for col, tree in converted.items()}


def load_torch_checkpoint(path: str, tasks=(), **kw):
    """Read a ``.pth`` file (torch serialization) and convert.

    Accepts raw state_dicts or training checkpoints with a ``model`` key
    (reference utils.py:64-69 / save_checkpoint:280-294).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torch_state_dict(sd, tasks, **kw)
