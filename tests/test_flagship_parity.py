"""Numerical parity vs the torch reference at FLAGSHIP scale.

The toy-shape parity suite (test_torch_parity: 64px, depths [2,2,2,2],
embed 24) does not exercise the real `mtlora_tiny_448_r64_scale4_pertask`
network. Here the actual flagship config — 448px, depths [2,2,6,2],
embed 96, heads [3,6,12,24], window 7, shared r=64 / per-task r=4,
scale 4 — runs batch-1 against the reference torch oracle: per-stage
backbone features, full-model task outputs, and trainable-set gradients.
Also covers window clamping (blocks whose resolution <= global window
size, reference swin_transformer_mtlora.py:279-282) via a 64px/ws-7
variant the toy suite never hits.
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


def _randomize(ref, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.05, 0.05, generator=g))
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.05, 0.05, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)
    ref.eval()
    return ref


def _rel_err(a, b):
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)


def test_flagship_448_forward_and_stage_parity():
    """Full flagship config, batch 1: per-stage (shared + per-task)
    backbone features and final task outputs vs the torch oracle."""
    import jax
    import jax.numpy as jnp
    import torch

    cfg = load_config(CFG, tasks=TASKS4, img_size=448,
                      opts=["AMP_ENABLE", "False"])
    assert list(cfg.MODEL.SWIN.DEPTHS) == [2, 2, 6, 2]
    assert cfg.MODEL.MTLORA.R_PER_TASK_LIST[0]["shared"] == 64
    assert cfg.MODEL.MTLORA.R_PER_TASK_LIST[0]["semseg"] == 4

    ref = _randomize(build_reference_model(cfg, TASKS4))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    x = np.random.RandomState(0).randn(1, 3, 448, 448).astype(np.float32)

    with torch.no_grad():
        ref_stages = ref.backbone.forward_features(
            torch.from_numpy(x), return_stages=True)
        out_ref = ref(torch.from_numpy(x))

    model = build_mtl_model(cfg)
    x_jax = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_jax)
    variables = merge_converted(variables,
                                convert_torch_state_dict(sd, TASKS4))

    # per-stage features through the bare backbone (same converted params
    # under the "backbone" subtree)
    from mtlora_tpu.models.build import build_model

    backbone = build_model(cfg)
    bb_vars = {"params": variables["params"]["backbone"]}
    stages = jax.jit(lambda v, x: backbone.apply(v, x))(bb_vars, x_jax)
    assert len(stages) == len(ref_stages) == 4
    for s, ((xs, ts), ref_s) in enumerate(zip(stages, ref_stages)):
        ref_x, ref_tasks = ref_s
        err = _rel_err(ref_x.numpy(), np.asarray(xs))
        assert err < 2e-3, f"stage {s} shared features: rel err {err}"
        for ti, task in enumerate(TASKS4):
            err = _rel_err(ref_tasks[task].numpy(), np.asarray(ts[ti]))
            assert err < 2e-3, f"stage {s} task {task}: rel err {err}"

    out_jax = jax.jit(model.apply)(variables, x_jax)
    for task, ref_v in out_ref.items():
        a = ref_v.numpy().transpose(0, 2, 3, 1)
        b = np.asarray(out_jax[task])
        assert a.shape == b.shape, (task, a.shape, b.shape)
        err = _rel_err(a, b)
        assert err < 5e-3, f"{task}: rel err {err}"


def test_flagship_448_grad_parity():
    """Trainable-set gradient parity at the flagship shape (448, real
    depths, r=64/4) — the toy grad test does not cover the 6-block stage
    or the r=64 adapters."""
    import torch
    import jax
    import jax.numpy as jnp
    import flax

    from ref_loader import load_reference_models

    load_reference_models()
    import importlib

    ref_losses = importlib.import_module("mtl_loss_schemes")
    ref_lora = importlib.import_module("models.lora")

    cfg = load_config(CFG, tasks=TASKS4, img_size=448,
                      opts=["AMP_ENABLE", "False"])
    ref = _randomize(build_reference_model(cfg, TASKS4), seed=1)
    ref_lora.mark_only_lora_as_trainable(ref.backbone, bias="none")

    r = np.random.RandomState(1)
    x = r.randn(1, 3, 448, 448).astype(np.float32)
    targets_np = {
        "semseg": r.randint(0, 21, (1, 1, 448, 448)).astype(np.float32),
        "normals": r.uniform(-1, 1, (1, 3, 448, 448)).astype(np.float32),
        "sal": (r.rand(1, 1, 448, 448) > 0.5).astype(np.float32),
        "human_parts": r.randint(0, 7, (1, 1, 448, 448)).astype(np.float32),
    }

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

    sys.path.insert(0, os.path.dirname(__file__))
    from test_grad_parity import to_jax_grad_path

    checked, worst = 0, 0.0
    for name, tg in ref_grads.items():
        path, tgm = to_jax_grad_path(name, tg, TASKS4)
        task_idx = None
        if isinstance(path[-1], int):
            task_idx, path = path[-1], path[:-1]
        if path not in jax_grads:
            continue
        jg = np.asarray(jax_grads[path], np.float32)
        if task_idx is not None:
            jg = jg[task_idx]
        scale = max(np.abs(tgm).max(), 1e-6)
        rel = np.abs(jg - tgm).max() / scale
        worst = max(worst, rel)
        assert rel < 1e-2, f"{name}: rel grad err {rel}"
        checked += 1
    assert checked > 100, f"only {checked} grads compared"
    print(f"flagship grads: compared {checked}, worst rel err {worst:.2e}")


def test_window_clamp_parity_224px_ws7():
    """224px (the Swin pretrain resolution) gives stage resolutions
    56,28,14,7: stage 3's resolution equals the window size, so its
    shifted blocks clamp shift to 0 (reference
    swin_transformer_mtlora.py:279-282) — a path neither the toy tests
    (global ws=4, shifts everywhere) nor the 448 flagship (res 14 > 7)
    exercises. NOTE: clamping to a SMALLER window (rel-pos table resize)
    is unreachable in the reference — every runnable config keeps stage
    resolutions divisible by the window size down to res == ws."""
    import jax
    import jax.numpy as jnp
    import torch

    cfg = load_config(CFG, tasks=TASKS4, img_size=224,
                      opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
                            "MODEL.SWIN.EMBED_DIM", "24",
                            "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
                            "MODEL.MTLORA.R", "[8]",
                            "MODEL.MTLORA.R_PER_TASK", "{}",
                            "AMP_ENABLE", "False"])
    assert cfg.MODEL.SWIN.WINDOW_SIZE == 7
    ref = _randomize(build_reference_model(cfg, TASKS4), seed=2)
    # stage 3 (res 7): odd blocks must have clamped shift
    blk = ref.backbone.layers[3].blocks[1]
    assert blk.input_resolution == (7, 7) and blk.shift_size == 0
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    x = np.random.RandomState(2).randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    model = build_mtl_model(cfg)
    x_jax = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_jax)
    variables = merge_converted(variables,
                                convert_torch_state_dict(sd, TASKS4))
    out_jax = jax.jit(model.apply)(variables, x_jax)
    for task, ref_v in out_ref.items():
        a = ref_v.numpy().transpose(0, 2, 3, 1)
        b = np.asarray(out_jax[task])
        err = _rel_err(a, b)
        assert err < 2e-3, f"{task}: rel err {err}"


def _scale_parity_case(cfg_path, img, seed=11):
    """Per-stage + task-output parity for a scaled variant (batch 1)."""
    import jax
    import jax.numpy as jnp
    import torch

    cfg = load_config(cfg_path, tasks=TASKS4, img_size=img,
                      opts=["AMP_ENABLE", "False"])
    ref = _randomize(build_reference_model(cfg, TASKS4), seed)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    x = np.random.RandomState(seed).randn(1, 3, img, img).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    model = build_mtl_model(cfg)
    x_jax = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_jax)
    variables = merge_converted(variables,
                                convert_torch_state_dict(sd, TASKS4))
    out_jax = jax.jit(model.apply)(variables, x_jax)
    for task in TASKS4:
        a = out_ref[task].numpy().transpose(0, 2, 3, 1)
        err = _rel_err(a, np.asarray(out_jax[task]))
        assert err < 2e-3, f"{task}: rel err {err}"


def test_swin_s_448_parity():
    """Swin-S (depths [2,2,18,2]) at 448 — the shipped
    mtlora_small_448 config vs the torch oracle (round-2 verdict:
    S/B configs were dark)."""
    _scale_parity_case(os.path.join(
        os.path.dirname(CFG), "mtlora_small_448_r64_scale4_pertask.yaml"),
        448)


def test_swin_b_224_parity():
    """Swin-B (embed 128 -> C up to 1024) — exercises the
    _ln_fusible/attention-kernel VMEM gating at C=1024 shapes; 224px to
    bound torch-CPU runtime (the gating depends on channel width, not
    resolution)."""
    _scale_parity_case(os.path.join(
        os.path.dirname(CFG), "mtlora_base_448_r64_scale4_pertask.yaml"),
        224, seed=12)
