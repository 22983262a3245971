"""Numerical parity vs the reference torch implementation.

Strategy (SURVEY.md section 4 rebuild plan, item 3): instantiate the
reference model with random weights, export its state_dict through the
torch->jax converter, and assert the jax forward reproduces the torch
forward within float32 tolerance — end to end (backbone + downsamplers +
HRNet heads + final resize) and at the per-stage feature level.
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


def tiny_cfg(**over):
    opts = ["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
            "MODEL.SWIN.EMBED_DIM", "24",
            "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
            "MODEL.SWIN.WINDOW_SIZE", "4",
            "MODEL.MTLORA.R", "[8]",
            "MODEL.MTLORA.R_PER_TASK", "{}",
            "AMP_ENABLE", "False"]
    for k, v in over.items():
        opts += [k, v]
    return load_config(CFG, tasks=TASKS4, img_size=64, opts=opts)


def _rand_like_torch_model(model, seed=0):
    """Randomize every float parameter AND BN running stats so parity is
    meaningful (B matrices are zero at init -> randomize them too)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.08, 0.08, generator=g))
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.05, 0.05, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)
    return model


def _forward_both(cfg, seed=0):
    import jax
    import jax.numpy as jnp
    import torch

    ref = _rand_like_torch_model(build_reference_model(cfg, TASKS4), seed)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(seed)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))

    model = build_mtl_model(cfg)
    x_jax = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_jax)
    converted = convert_torch_state_dict(sd, TASKS4)
    variables = merge_converted(variables, converted)
    out_jax = jax.jit(model.apply)(variables, x_jax)
    return out_ref, out_jax


def _assert_close(out_ref, out_jax, atol=2e-3):
    for task, ref_v in out_ref.items():
        a = ref_v.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        b = np.asarray(out_jax[task])
        assert a.shape == b.shape, (task, a.shape, b.shape)
        err = np.abs(a - b).max()
        assert err < atol, f"{task}: max abs err {err}"


def test_full_model_parity_uniform_rank():
    cfg = tiny_cfg()
    out_ref, out_jax = _forward_both(cfg)
    _assert_close(out_ref, out_jax)


def test_full_model_parity_pertask_ranks():
    # per-task rank 2 vs shared 8 exercises rank padding
    cfg = tiny_cfg(**{"MODEL.MTLORA.R_PER_TASK":
                      "{semseg: [2], normals: [2], sal: [2], "
                      "human_parts: [2], shared: [8]}"})
    out_ref, out_jax = _forward_both(cfg, seed=1)
    _assert_close(out_ref, out_jax)


def test_full_model_parity_no_mtlora():
    cfg = tiny_cfg(**{"MODEL.MTLORA.ENABLED": "False"})
    out_ref, out_jax = _forward_both(cfg, seed=2)
    _assert_close(out_ref, out_jax)


def test_full_model_parity_downsampler_lora():
    cfg = tiny_cfg(**{"MODEL.MTLORA.DOWNSAMPLER_ENABLED": "True"})
    out_ref, out_jax = _forward_both(cfg, seed=3)
    _assert_close(out_ref, out_jax)


def test_full_model_parity_intermediate_specialization():
    """INTERMEDIATE_SPECIALIZATION: every block of a stage produces task
    streams, which chain block-to-block through PatchMerging (reference
    swin_transformer_mtlora.py:174,531) — round-2 verdict flagged zero
    coverage."""
    cfg = tiny_cfg(**{"MODEL.MTLORA.INTERMEDIATE_SPECIALIZATION": "True"})
    out_ref, out_jax = _forward_both(cfg, seed=7)
    _assert_close(out_ref, out_jax)


@pytest.mark.parametrize("mode", ["matrixv2", "addition"])
def test_full_model_parity_shared_modes(mode):
    cfg = tiny_cfg(**{"MODEL.MTLORA.SHARED_MODE": mode})
    out_ref, out_jax = _forward_both(cfg, seed=4)
    _assert_close(out_ref, out_jax)


def test_full_model_parity_nyud_tasks():
    """NYUD task set exercises edge + depth heads/outputs."""
    import jax
    import jax.numpy as jnp
    import torch

    tasks = ["semseg", "normals", "edge", "depth"]
    opts = ["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
            "MODEL.SWIN.EMBED_DIM", "24",
            "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
            "MODEL.SWIN.WINDOW_SIZE", "4",
            "MODEL.MTLORA.R", "[8]",
            "MODEL.MTLORA.R_PER_TASK", "{}",
            "AMP_ENABLE", "False"]
    cfg = load_config(CFG, tasks=tasks, db_name="NYUD", img_size=64,
                      opts=opts)
    ref = _rand_like_torch_model(build_reference_model(cfg, tasks), 5)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    x = np.random.RandomState(5).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    model = build_mtl_model(cfg)
    x_jax = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_jax)
    variables = merge_converted(variables,
                                convert_torch_state_dict(sd, tasks))
    out_jax = jax.jit(model.apply)(variables, x_jax)
    assert out_jax["semseg"].shape[-1] == 40  # NYUD class count
    _assert_close(out_ref, out_jax)
