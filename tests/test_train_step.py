"""Train-step tests: masking semantics, LR schedule parity points, and a
data-parallel step over the virtual 8-device mesh (frozen params must not
move; LoRA params must)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax

from mtlora_tpu.config import load_config
from mtlora_tpu.data.task_config import LOSS_WEIGHTS
from mtlora_tpu.models.mtl import build_mtl_model
from mtlora_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree
from mtlora_tpu.train.optim import (
    build_optimizer,
    build_schedule,
    count_params,
    lora_trainable_mask,
    no_weight_decay_mask,
)
from mtlora_tpu.train.step import (
    TrainState,
    jit_train_step,
    make_train_step,
)

CFG = os.path.join(os.path.dirname(__file__), "..",
                   "configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml")
TASKS4 = ["semseg", "normals", "sal", "human_parts"]


def small_config():
    return load_config(CFG, tasks=TASKS4, img_size=64,
                       opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
                             "MODEL.SWIN.EMBED_DIM", "24",
                             "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
                             "MODEL.SWIN.WINDOW_SIZE", "4",
                             "AMP_ENABLE", "False"])


def make_batch(n=8, img=64, seed=0):
    r = np.random.RandomState(seed)
    return {
        "image": r.randn(n, img, img, 3).astype(np.float32),
        "semseg": r.randint(0, 21, (n, img, img, 1)).astype(np.float32),
        "normals": r.uniform(-1, 1, (n, img, img, 3)).astype(np.float32),
        "sal": (r.rand(n, img, img, 1) > 0.5).astype(np.float32),
        "human_parts": r.randint(0, 7, (n, img, img, 1)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = small_config()
    model = build_mtl_model(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return cfg, model, variables


def test_trainable_mask_semantics(setup):
    cfg, model, variables = setup
    mask = flax.traverse_util.flatten_dict(
        lora_trainable_mask(variables["params"], cfg))
    for path, trainable in mask.items():
        p = "/".join(path)
        if path[0] != "backbone":
            assert trainable, p  # decoders/downsamplers always train
        elif any(s.startswith("lora_") for s in path):
            assert trainable, p
        elif "kernel" in path and ("qkv" in path or "fc1" in path):
            assert not trainable, p  # frozen pretrained weights
    counts = count_params(variables["params"], cfg)
    assert counts["lora"] > 0
    assert counts["trainable"] < counts["total"]
    assert counts["trainable"] >= counts["lora"] + counts["decoder"]


def test_weight_decay_mask(setup):
    cfg, model, variables = setup
    wd = flax.traverse_util.flatten_dict(
        no_weight_decay_mask(variables["params"]))
    for path, decayed in wd.items():
        p = "/".join(path)
        if path[-1] == "bias" or "relative_position_bias_table" in p:
            assert not decayed, p
        if path[-1] == "scale":  # LayerNorm scales are 1-D
            assert not decayed, p


def test_cosine_schedule_parity_points():
    cfg = small_config()
    sched = build_schedule(cfg, n_iter_per_epoch=100, world_size=1)
    base = cfg.TRAIN.BASE_LR * cfg.DATA.BATCH_SIZE / 512.0
    warm = cfg.TRAIN.WARMUP_LR * cfg.DATA.BATCH_SIZE / 512.0
    minlr = cfg.TRAIN.MIN_LR * cfg.DATA.BATCH_SIZE / 512.0
    # step 0 -> warmup_lr
    np.testing.assert_allclose(float(sched(0)), warm, rtol=1e-5)
    # end of warmup -> base lr
    w_steps = cfg.TRAIN.WARMUP_EPOCHS * 100
    np.testing.assert_allclose(float(sched(w_steps)), base, rtol=1e-3)
    # final step -> min lr
    total = cfg.TRAIN.EPOCHS * 100
    np.testing.assert_allclose(float(sched(total)), minlr, rtol=1e-3)
    # midpoint of cosine (half of post-warmup span) -> (base+min)/2
    mid = w_steps + (total - w_steps) // 2
    np.testing.assert_allclose(float(sched(mid)), (base + minlr) / 2,
                               rtol=1e-2)


def test_train_step_dp_mesh(setup):
    cfg, model, variables = setup
    mesh = make_mesh([-1])
    assert mesh.devices.size == 8
    tx = build_optimizer(cfg, variables["params"], n_iter_per_epoch=10)
    # copy: the jitted step donates its input state buffers
    fresh = jax.tree.map(jnp.array, variables)
    state = TrainState.create(
        params=fresh["params"], tx=tx,
        batch_stats=fresh.get("batch_stats", {}),
        rng=jax.random.PRNGKey(0))
    state = replicate_tree(state, mesh)
    step = jit_train_step(
        make_train_step(model, tx, TASKS4), mesh)
    batch = shard_batch(make_batch(8), mesh)
    before = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, state.params))
    state2, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    for t in TASKS4:
        assert np.isfinite(float(metrics[f"loss_{t}"]))
    after = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, state2.params))
    mask = flax.traverse_util.flatten_dict(
        lora_trainable_mask(variables["params"], cfg))
    moved = frozen_moved = 0
    for path in before:
        changed = not np.array_equal(before[path], after[path])
        if mask[path]:
            moved += changed
        elif changed:
            frozen_moved += 1
    assert frozen_moved == 0, "frozen params must not change"
    # LoRA B start at zero but have nonzero grads only after A*x nonzero;
    # shared A/B and decoders must move
    assert moved > 50


def test_grad_accumulation_step(setup):
    cfg, model, variables = setup
    tx = build_optimizer(cfg, variables["params"], n_iter_per_epoch=10)
    fresh = jax.tree.map(jnp.array, variables)
    state = TrainState.create(
        params=fresh["params"], tx=tx,
        batch_stats=fresh.get("batch_stats", {}),
        rng=jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, TASKS4, accum_steps=2))
    state2, metrics = step(state, make_batch(4))
    assert np.isfinite(float(metrics["loss"]))
