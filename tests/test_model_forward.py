"""Model forward smoke + shape tests for the MTL Swin assembly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlora_tpu.config import load_config
from mtlora_tpu.models.lora import LoRASpec, MTLoRALinear, MTLoRASpec
from mtlora_tpu.models.mtl import build_mtl_model

CFG = os.path.join(os.path.dirname(__file__), "..",
                   "configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml")
TASKS4 = ["semseg", "normals", "sal", "human_parts"]


def small_config(img_size=64):
    return load_config(CFG, tasks=TASKS4, img_size=img_size,
                       opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
                             "MODEL.SWIN.EMBED_DIM", "24",
                             "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
                             "MODEL.SWIN.WINDOW_SIZE", "4",
                             "AMP_ENABLE", "False"])


@pytest.mark.quick
def test_mtlora_linear_shapes_and_semantics():
    spec = LoRASpec(r_shared=8, r_tasks=(4, 2), shared_scale=2.0,
                    task_scales=(1.5, 3.0))
    layer = MTLoRALinear(16, 32, spec=spec, has_tasks=True)
    x = jnp.ones((3, 5, 16))
    params = layer.init(jax.random.PRNGKey(0), x)
    y, y_tasks = layer.apply(params, x)
    assert y.shape == (3, 5, 32)
    assert y_tasks.shape == (2, 3, 5, 32)
    # B matrices init to zero -> task output equals pretrained at init
    np.testing.assert_allclose(np.asarray(y_tasks[0]), np.asarray(y),
                               rtol=1e-6)
    # padded rank slots are dead: task 1 (r=2) must ignore A rows >= 2
    p = params["params"]
    A = np.asarray(p["lora_tasks_A"])
    assert A.shape == (2, 16, 4)
    B = p["lora_tasks_B"].at[:, :, :].set(1.0)  # activate B
    p2 = dict(p)
    p2["lora_tasks_B"] = B
    y2, t2 = layer.apply({"params": p2}, x)
    # poison padded slots of A for task 1; output must not change
    A_poison = p["lora_tasks_A"].at[1, :, 2:].set(7.0)
    p3 = dict(p2)
    p3["lora_tasks_A"] = A_poison
    y3, t3 = layer.apply({"params": p3}, x)
    np.testing.assert_allclose(np.asarray(t2[1]), np.asarray(t3[1]), rtol=1e-6)


@pytest.mark.quick
def test_mtlora_linear_r0_is_plain_linear():
    layer = MTLoRALinear(8, 8, spec=LoRASpec(r_shared=0), has_tasks=False)
    x = jnp.ones((2, 8))
    params = layer.init(jax.random.PRNGKey(0), x)
    y, t = layer.apply(params, x)
    assert t is None
    assert "lora_shared_A" not in params["params"]


@pytest.mark.quick
def test_matrixv2_includes_shared_update():
    spec = LoRASpec(r_shared=4, r_tasks=(4,), shared_scale=1.0,
                    task_scales=(1.0,), shared_mode="matrixv2")
    layer = MTLoRALinear(8, 8, spec=spec, has_tasks=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    params = layer.init(jax.random.PRNGKey(0), x)
    # set B_shared nonzero so shared update != 0
    p = dict(params["params"])
    p["lora_shared_B"] = p["lora_shared_B"].at[:, :].set(0.1)
    y, t = layer.apply({"params": p}, x)
    # task update is 0 (B_t = 0), so task output == shared output
    np.testing.assert_allclose(np.asarray(t[0]), np.asarray(y), rtol=1e-5)


@pytest.fixture(scope="module")
def small_model_and_vars():
    cfg = small_config()
    model = build_mtl_model(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, variables


@pytest.mark.quick
def test_full_model_forward_shapes(small_model_and_vars):
    model, variables = small_model_and_vars
    x = jnp.zeros((2, 64, 64, 3))
    out = jax.jit(model.apply)(variables, x)
    assert set(out.keys()) == set(TASKS4)
    assert out["semseg"].shape == (2, 64, 64, 21)
    assert out["normals"].shape == (2, 64, 64, 3)
    assert out["sal"].shape == (2, 64, 64, 1)
    assert out["human_parts"].shape == (2, 64, 64, 7)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_full_model_train_mode_runs(small_model_and_vars):
    model, variables = small_model_and_vars
    x = jnp.zeros((2, 64, 64, 3))
    rngs = {"dropout": jax.random.PRNGKey(1),
            "droppath": jax.random.PRNGKey(2)}
    out, updates = jax.jit(
        lambda v, x: model.apply(v, x, deterministic=False, rngs=rngs,
                                 mutable=["batch_stats"]))(variables, x)
    assert out["semseg"].shape == (2, 64, 64, 21)
    assert "batch_stats" in updates


def test_param_structure_has_expected_paths(small_model_and_vars):
    _, variables = small_model_and_vars
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    paths = {"/".join(k) for k in flat}
    # qkv has shared LoRA but no task adapters (reference :166)
    assert any("blocks_1/attn/qkv/lora_shared_A" in p for p in paths)
    assert not any("qkv/lora_tasks_A" in p for p in paths)
    # proj/fc1/fc2 on last block of stage carry task adapters
    assert any("layers_0/blocks_1/attn/proj/lora_tasks_A" in p for p in paths)
    assert any("layers_0/blocks_1/mlp/fc1/lora_tasks_A" in p for p in paths)
    # non-last blocks do not
    assert not any("layers_0/blocks_0/attn/proj/lora_tasks_A" in p
                   for p in paths)
    # per-task downsampler stacked kernels
    assert any(p.startswith("downsampler/scale_") for p in paths)
    t_lora = flat[("backbone", "layers_0", "blocks_1", "attn", "proj",
                   "lora_tasks_A")]
    assert t_lora.shape[0] == 4  # stacked over 4 tasks


def test_batched_heads_matches_module_path(small_model_and_vars,
                                           monkeypatch):
    """MTLORA_BATCHED_HEADS=1 (task-batched HRNet head einsums; default
    OFF, measured slower at flagship scale) must reproduce the module
    path exactly: same param tree, same logits, same batch_stats."""
    model, variables = small_model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))

    monkeypatch.setenv("MTLORA_BATCHED_HEADS", "0")
    ref = model.apply(variables, x)
    monkeypatch.setenv("MTLORA_BATCHED_HEADS", "1")
    out = model.apply(variables, x)
    for t in TASKS4:
        np.testing.assert_allclose(np.asarray(out[t]), np.asarray(ref[t]),
                                   atol=1e-4, rtol=1e-4)

    # train mode: running BN stats update identically
    rngs = {"dropout": jax.random.PRNGKey(1),
            "droppath": jax.random.PRNGKey(2)}

    def train_apply():
        return model.apply(variables, x, deterministic=False, rngs=rngs,
                           mutable=["batch_stats"])

    out_b, upd_b = train_apply()
    monkeypatch.setenv("MTLORA_BATCHED_HEADS", "0")
    out_r, upd_r = train_apply()
    for t in TASKS4:
        np.testing.assert_allclose(np.asarray(out_b[t]),
                                   np.asarray(out_r[t]),
                                   atol=1e-4, rtol=1e-4)
    import flax
    fb = flax.traverse_util.flatten_dict(upd_b["batch_stats"])
    fr = flax.traverse_util.flatten_dict(upd_r["batch_stats"])
    assert set(fb) == set(fr)
    for k in fb:
        np.testing.assert_allclose(np.asarray(fb[k]), np.asarray(fr[k]),
                                   atol=1e-4, rtol=1e-4)
