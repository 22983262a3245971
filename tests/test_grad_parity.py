"""Gradient parity vs the reference torch implementation.

Forward parity (test_torch_parity) does not cover the backward graph;
here the multi-task loss gradient wrt every TRAINABLE parameter (the
mark_only_lora_as_trainable set) is compared torch-vs-jax on the tiny
model with identical weights and batch, eval-mode stochasticity.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from ref_loader import build_reference_model, reference_available  # noqa: E402

from mtlora_tpu.config import load_config  # noqa: E402
from mtlora_tpu.ckpt.torch_convert import (  # noqa: E402
    convert_torch_state_dict,
    merge_converted,
)
from mtlora_tpu.models.mtl import build_mtl_model  # noqa: E402

TASKS4 = ["semseg", "normals", "sal", "human_parts"]
CFG = os.path.join(os.path.dirname(__file__), "..",
                   "configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml")

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def to_jax_grad_path(torch_name, torch_grad, tasks):
    """Map a torch trainable-param grad to the jax grad-tree leaf path
    (appends the task index for stacked per-task adapters)."""
    parts = torch_name.split(".")
    path = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("layers", "blocks") and parts[i + 1].isdigit():
            path.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            path.append(p)
            i += 1
    leaf = path[-1]
    if leaf in ("weight",) and path[-2].startswith("norm"):
        return tuple(path[:-1] + ["scale"]), torch_grad
    if leaf == "weight" and torch_grad.ndim == 2:
        return tuple(path[:-1] + ["kernel"]), torch_grad.T
    if leaf == "weight" and torch_grad.ndim == 4:
        return tuple(path[:-1] + ["kernel"]), \
            torch_grad.transpose(2, 3, 1, 0)
    if leaf in ("lora_shared_A", "lora_shared_B"):
        return tuple(path), torch_grad.T
    if path[-2] in ("lora_tasks_A", "lora_tasks_B"):
        ti = list(tasks).index(path[-1])
        return tuple(path[:-1]) + (ti,), torch_grad.T
    return tuple(path), torch_grad


@pytest.mark.parametrize("intermediate", [False, True])
def test_trainable_grad_parity(intermediate):
    import torch
    import jax
    import jax.numpy as jnp
    import flax

    from ref_loader import load_reference_models

    load_reference_models()  # installs timm/ptflops stubs + models pkg
    import importlib

    ref_losses = importlib.import_module("mtl_loss_schemes")
    ref_lora = importlib.import_module("models.lora")

    cfg = load_config(CFG, tasks=TASKS4, img_size=64,
                      opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
                            "MODEL.SWIN.EMBED_DIM", "24",
                            "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
                            "MODEL.SWIN.WINDOW_SIZE", "4",
                            "MODEL.MTLORA.R", "[8]",
                            "MODEL.MTLORA.R_PER_TASK", "{}",
                            "MODEL.MTLORA.INTERMEDIATE_SPECIALIZATION",
                            str(intermediate),
                            "AMP_ENABLE", "False"])
    ref = build_reference_model(cfg, TASKS4)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.08, 0.08, generator=g))
    ref.eval()
    ref_lora.mark_only_lora_as_trainable(ref.backbone, bias="none")

    r = np.random.RandomState(0)
    x = r.randn(2, 3, 64, 64).astype(np.float32)
    targets_np = {
        "semseg": r.randint(0, 21, (2, 1, 64, 64)).astype(np.float32),
        "normals": r.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32),
        "sal": (r.rand(2, 1, 64, 64) > 0.5).astype(np.float32),
        "human_parts": r.randint(0, 7, (2, 1, 64, 64)).astype(np.float32),
    }

    # ---- torch side -------------------------------------------------------
    loss_ft = torch.nn.ModuleDict(
        {t: ref_losses.get_loss({}, t) for t in TASKS4})
    weights = {"semseg": 1.0, "normals": 10.0, "sal": 5.0,
               "human_parts": 2.0}
    criterion = ref_losses.MultiTaskLoss(TASKS4, loss_ft, weights)
    out = ref(torch.from_numpy(x))
    total, _ = criterion(out, {k: torch.from_numpy(v)
                               for k, v in targets_np.items()})
    total.backward()
    ref_grads = {n: p.grad.numpy() for n, p in ref.named_parameters()
                 if p.requires_grad and p.grad is not None}

    # ---- jax side ---------------------------------------------------------
    from mtlora_tpu.train.losses import multi_task_loss

    model = build_mtl_model(cfg)
    x_jax = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_jax)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = merge_converted(variables,
                                convert_torch_state_dict(sd, TASKS4))
    batch = {k: jnp.asarray(v.transpose(0, 2, 3, 1))
             for k, v in targets_np.items()}

    def loss_fn(params):
        preds = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            x_jax, deterministic=True, train_bn=False)
        t, _ = multi_task_loss(preds, batch, TASKS4)
        return t

    jax_grads = flax.traverse_util.flatten_dict(
        jax.jit(jax.grad(loss_fn))(variables["params"]))

    checked = 0
    worst = 0.0
    for name, tg in ref_grads.items():
        path, tgm = to_jax_grad_path(name, tg, TASKS4)
        task_idx = None
        if isinstance(path[-1], int):
            task_idx = path[-1]
            path = path[:-1]
        if path not in jax_grads:
            continue
        jg = np.asarray(jax_grads[path], np.float32)
        if task_idx is not None:
            jg = jg[task_idx]
        scale = max(np.abs(tgm).max(), 1e-6)
        rel = np.abs(jg - tgm).max() / scale
        worst = max(worst, rel)
        assert rel < 5e-3, f"{name}: rel grad err {rel}"
        checked += 1
    assert checked > 50, f"only {checked} grads compared"
    print(f"compared {checked} grads, worst rel err {worst:.2e}")
