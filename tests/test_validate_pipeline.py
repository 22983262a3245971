"""Whole-validate()-pipeline parity vs the reference (VERDICT r2 item 3).

Per-meter and per-model parity existed since round 2, but the COMPOSED
eval path — forward -> get_output (argmax/sigmoid/normalize) -> meters
-> final score dict, i.e. what defines "paper-parity mIoU"
(/root/reference/main.py:439-528, evaluation/evaluate_utils.py:20-63) —
was never compared as a unit. This test drives the reference's own
validate() machinery (model, get_output, PerformanceMeter imported as a
black-box oracle) and THIS repo's real ``train.loop.validate`` over the
same synthetic val set with converter-matched weights, fp32, and
asserts the final score dicts agree.

Flagship-shape (448, depths [2,2,6,2], r64/4) is covered batch-2 to
keep torch-CPU runtime sane; a tiny NYUD case covers the edge/depth
meter composition.
"""

import os
import sys
import types

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

CFG = os.path.join(os.path.dirname(__file__), "..",
                   "configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml")

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def _synthetic_batches(tasks, img, n_batches, bsz, seed=0):
    r = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        b = {"image": r.randn(bsz, 3, img, img).astype(np.float32)}
        for t in tasks:
            if t == "semseg":
                gt = r.randint(0, 21, (bsz, 1, img, img)).astype(np.float32)
                gt[r.rand(*gt.shape) < 0.1] = 255.0  # ignore region
            elif t == "human_parts":
                gt = r.randint(0, 7, (bsz, 1, img, img)).astype(np.float32)
                gt[r.rand(*gt.shape) < 0.1] = 255.0
            elif t == "sal":
                gt = (r.rand(bsz, 1, img, img) > 0.5).astype(np.float32)
            elif t == "normals":
                v = r.randn(bsz, 3, img, img).astype(np.float32)
                v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
                gt = v
            elif t == "edge":
                gt = (r.rand(bsz, 1, img, img) > 0.9).astype(np.float32)
            elif t == "depth":
                gt = r.uniform(0.5, 10.0,
                               (bsz, 1, img, img)).astype(np.float32)
            b[t] = gt
        batches.append(b)
    return batches


def _reference_validate(cfg, tasks, ref_model, batches):
    """The reference validate() composition (main.py:462-501) without
    the .cuda()/wandb plumbing."""
    import importlib
    import torch

    eval_pkg = importlib.import_module("evaluation.evaluate_utils")
    get_output = eval_pkg.get_output
    PerformanceMeter = eval_pkg.PerformanceMeter

    meter = PerformanceMeter(cfg, cfg.DATA.DBNAME)
    ref_model.eval()
    with torch.no_grad():
        for b in batches:
            images = torch.from_numpy(b["image"])
            targets = {t: torch.from_numpy(b[t]) for t in tasks}
            output = ref_model(images)
            processed = {t: get_output(output[t], t) for t in tasks}
            meter.update(processed, targets)
    return meter.get_score(verbose=False)


class _ListLoader:
    """Minimal loader facade over pre-built NHWC batches."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def iter_epoch(self, epoch):
        return iter(self.batches)


def _our_validate(cfg, tasks, variables, batches):
    import jax

    from mtlora_tpu.train.loop import validate
    from mtlora_tpu.train.step import jit_eval_step, make_eval_step

    model = build_mtl_model(cfg)
    nhwc = [{k: (v.transpose(0, 2, 3, 1) if k != "meta" else v)
             for k, v in b.items()} for b in batches]
    state = types.SimpleNamespace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}))
    eval_step = jit_eval_step(make_eval_step(model))
    return validate(cfg, state, eval_step, _ListLoader(nhwc))


def _run_case(cfg, tasks, img, n_batches=2, bsz=2, seed=0):
    import torch
    import jax

    ref = build_reference_model(cfg, list(tasks))
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.08, 0.08, generator=g))
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.05, 0.05, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)

    batches = _synthetic_batches(tasks, img, n_batches, bsz, seed)
    scores_ref = _reference_validate(cfg, tasks, ref, batches)

    import jax.numpy as jnp

    model = build_mtl_model(cfg)
    x0 = jnp.asarray(batches[0]["image"].transpose(0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = merge_converted(variables,
                                convert_torch_state_dict(sd, list(tasks)))
    scores_jax = _our_validate(cfg, tasks, variables, batches)

    print("\nside-by-side validate() scores:")
    for t in tasks:
        for k, v in scores_ref[t].items():
            if not isinstance(v, (int, float, np.floating)):
                continue
            ours = scores_jax[t].get(k)
            print(f"  {t:12s} {k:10s} ref={float(v):10.4f} "
                  f"ours={float(ours):10.4f}")
            assert ours is not None, f"missing score {t}/{k}"
            # fp32 both sides: smooth metrics agree to ~1e-5 rel; the
            # tolerance leaves room for rare argmax tie flips
            tol = max(1e-3 * abs(float(v)), 2e-3)
            assert abs(float(v) - float(ours)) < tol, (
                f"{t}/{k}: ref {v} vs ours {ours}")
    return scores_ref, scores_jax


def test_validate_pipeline_parity_flagship_448():
    tasks = ("semseg", "normals", "sal", "human_parts")
    cfg = load_config(CFG, tasks=list(tasks), img_size=448,
                      opts=["AMP_ENABLE", "False",
                            "DATA.BATCH_SIZE", "2"])
    _run_case(cfg, tasks, 448, n_batches=2, bsz=2)


def test_validate_pipeline_parity_nyud_edge_depth():
    tasks = ("semseg", "normals", "edge", "depth")
    cfg = load_config(CFG, tasks=list(tasks), img_size=64,
                      db_name="NYUD",
                      opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
                            "MODEL.SWIN.EMBED_DIM", "24",
                            "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
                            "MODEL.SWIN.WINDOW_SIZE", "4",
                            "MODEL.MTLORA.R", "[8]",
                            "MODEL.MTLORA.R_PER_TASK", "{}",
                            "AMP_ENABLE", "False",
                            "DATA.BATCH_SIZE", "2"])
    _run_case(cfg, tasks, 64, n_batches=2, bsz=2, seed=1)
