"""End-to-end smoke: synthetic dataset -> transform pipeline -> DP train
epochs -> validate with streaming meters -> checkpoint save/resume.
(The reference's closest analogue is its overfit=64 mode; SURVEY.md
section 4 item 5 calls for an overfit convergence smoke test.)"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlora_tpu.config import load_config
from mtlora_tpu.data.loader import DataLoader
from mtlora_tpu.data.synthetic import SyntheticMTL
from mtlora_tpu.data.transforms import get_transformations
from mtlora_tpu.data.task_config import get_tasks_config
from mtlora_tpu.models.mtl import build_mtl_model
from mtlora_tpu.parallel.mesh import make_mesh, replicate_tree
from mtlora_tpu.train.loop import throughput, train_one_epoch, validate
from mtlora_tpu.train.optim import build_optimizer
from mtlora_tpu.train.step import (
    TrainState, jit_eval_step, jit_train_step, make_eval_step,
    make_train_step)

CFG = os.path.join(os.path.dirname(__file__), "..",
                   "configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml")
TASKS = ["semseg", "normals", "sal", "human_parts"]


@pytest.fixture(scope="module")
def everything():
    cfg = load_config(CFG, tasks=TASKS, img_size=64,
                      opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
                            "MODEL.SWIN.EMBED_DIM", "24",
                            "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
                            "MODEL.SWIN.WINDOW_SIZE", "4",
                            "DATA.BATCH_SIZE", "8",
                            "DATA.NUM_WORKERS", "2",
                            "AMP_ENABLE", "False",
                            "PRINT_FREQ", "2"])
    tasks_cfg, _ = get_tasks_config("PASCALContext", TASKS, 64)
    rng = np.random.RandomState(0)
    tr_train, tr_val = get_transformations("PASCALContext", tasks_cfg, rng)
    ds_train = SyntheticMTL(TASKS, 64, length=16, transform=tr_train)
    ds_val = SyntheticMTL(TASKS, 64, length=8, transform=tr_val, seed=1)
    loader_train = DataLoader(ds_train, 8, num_workers=2, seed=0)
    loader_val = DataLoader(ds_val, 8, shuffle=False, drop_last=False,
                            num_workers=2)
    mesh = make_mesh([-1])
    model = build_mtl_model(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)))
    tx = build_optimizer(cfg, variables["params"],
                         n_iter_per_epoch=len(loader_train))

    def fresh_state():
        fresh = jax.tree.map(jnp.array, variables)
        st = TrainState.create(params=fresh["params"], tx=tx,
                               batch_stats=fresh.get("batch_stats", {}),
                               rng=jax.random.PRNGKey(0))
        return replicate_tree(st, mesh)

    train_step = jit_train_step(make_train_step(model, tx, TASKS), mesh)
    eval_step = jit_eval_step(make_eval_step(model), mesh)
    return (cfg, mesh, model, fresh_state, train_step, eval_step,
            loader_train, loader_val)


def test_transform_pipeline_shapes():
    tasks_cfg, _ = get_tasks_config("PASCALContext", TASKS, 64)
    rng = np.random.RandomState(0)
    tr_train, _ = get_transformations("PASCALContext", tasks_cfg, rng)
    ds = SyntheticMTL(TASKS, 96, length=2, transform=tr_train)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["image"].dtype == np.float32
    assert s["semseg"].shape == (64, 64, 1)
    assert s["normals"].shape == (64, 64, 3)
    # after augmentation normals stay unit or 255-ignore
    n = s["normals"]
    mask = ~(n == 255).any(axis=-1)
    norms = np.linalg.norm(n[mask], axis=-1)
    if norms.size:
        assert np.abs(norms - 1).max() < 1e-3


def test_train_epochs_reduce_loss(everything):
    (cfg, mesh, model, fresh_state, train_step, eval_step, loader_train,
     loader_val) = everything
    state = fresh_state()
    state, m0 = train_one_epoch(cfg, state, train_step, loader_train, 0,
                                mesh)
    for ep in range(1, 4):
        state, m = train_one_epoch(cfg, state, train_step, loader_train,
                                   ep, mesh)
    assert np.isfinite(m["loss"])
    assert m["loss"] < m0["loss"], (m0, m)
    everything_state = state  # noqa: F841

    # validation end to end
    scores = validate(cfg, state, eval_step, loader_val, 0, mesh)
    assert set(scores) == set(TASKS)
    assert 0 <= scores["semseg"]["mIoU"] <= 1
    assert scores["normals"]["mean"] >= 0
    assert 0 <= scores["sal"]["maxF"] <= 1

    # throughput harness runs and syncs
    rate = throughput(cfg, state, eval_step, loader_val, mesh,
                      warmup=2, timed=3)
    assert rate > 0


def test_checkpoint_roundtrip(tmp_path, everything):
    (cfg, mesh, model, fresh_state, train_step, eval_step, loader_train,
     loader_val) = everything
    state = fresh_state()
    from mtlora_tpu.ckpt.checkpoint import (
        auto_resume_helper, load_checkpoint, save_checkpoint)

    path = save_checkpoint(str(tmp_path), 3, state, max_accuracy=0.5)
    assert auto_resume_helper(str(tmp_path)) == path
    zeroed = state.replace(
        params=jax.tree.map(jnp.zeros_like, state.params))
    out = load_checkpoint(path, zeroed)
    assert out["epoch"] == 3 and out["max_accuracy"] == 0.5
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(out["state"].params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
