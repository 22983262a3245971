#!/usr/bin/env python
"""On-device sanity: train the flagship 448 config for 40 steps on the
local TPU (Pallas kernels active) and assert the loss decreases. Run
after any kernel or toolchain change; complements the CPU-mesh test
suite which cannot execute compiled Pallas."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from mtlora_tpu.config import load_config
from mtlora_tpu.models.mtl import build_mtl_model
from mtlora_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from mtlora_tpu.train.optim import build_optimizer
from mtlora_tpu.train.step import TrainState, jit_train_step, make_train_step

tasks = ("semseg","normals","sal","human_parts")
img, B = 448, 16
cfg = load_config("/root/repo/configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml",
                  tasks=list(tasks), img_size=img,
                  opts=["DATA.BATCH_SIZE", str(B)])
model = build_mtl_model(cfg)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((2,img,img,3)))
mesh = make_mesh([-1])
tx = build_optimizer(cfg, variables["params"], n_iter_per_epoch=10)
state = replicate_tree(TrainState.create(
    params=variables["params"], tx=tx,
    batch_stats=variables.get("batch_stats", {}),
    rng=jax.random.PRNGKey(0)), mesh)
r = np.random.RandomState(0)
batch = shard_batch({
    "image": r.randn(B, img, img, 3).astype(np.float32),
    "semseg": r.randint(0, 21, (B, img, img, 1)).astype(np.float32),
    "normals": r.uniform(-1, 1, (B, img, img, 3)).astype(np.float32),
    "sal": (r.rand(B, img, img, 1) > 0.5).astype(np.float32),
    "human_parts": r.randint(0, 7, (B, img, img, 1)).astype(np.float32)}, mesh)
step = jit_train_step(make_train_step(model, tx, tasks), mesh)
losses = []
for i in range(40):
    state, m = step(state, batch)
    if i % 10 == 0 or i == 39:
        losses.append(float(jax.device_get(m["loss"])))
        print(f"step {i}: loss {losses[-1]:.4f}", flush=True)
assert losses[-1] < losses[0], "flagship-shape training did not reduce loss"
print("flagship 448 convergence sanity: OK")
