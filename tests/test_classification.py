"""Legacy classification path: backbone head, losses, accuracy, mixup."""

import jax
import jax.numpy as jnp
import numpy as np

from mtlora_tpu.config import load_config
from mtlora_tpu.data.imagenet import MaskGenerator, mixup_cutmix
from mtlora_tpu.models.build import build_model
from mtlora_tpu.train.classification import (
    accuracy_topk,
    classification_loss,
    make_classification_train_step,
)
from mtlora_tpu.train.optim import build_optimizer
from mtlora_tpu.train.step import TrainState

import os

CFG = os.path.join(os.path.dirname(__file__), "..",
                   "configs/swin/swin_tiny_patch4_window7_448.yaml")


def small_cls_config():
    return load_config(
        CFG, img_size=64,
        opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
              "MODEL.SWIN.EMBED_DIM", "24",
              "MODEL.SWIN.NUM_HEADS", "[2, 2, 2, 2]",
              "MODEL.SWIN.WINDOW_SIZE", "4",
              "MODEL.NUM_CLASSES", "10",
              "AMP_ENABLE", "False"],
        tasks=None)


def test_classification_forward_and_loss():
    cfg = small_cls_config()
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, return_stages=False,
                                        flatten_ft=True))(
        jax.random.PRNGKey(0), x)
    logits = jax.jit(lambda v, x: model.apply(
        v, x, return_stages=False, flatten_ft=True))(v, x)
    assert logits.shape == (2, 10)
    labels = jnp.asarray([1, 3])
    loss = classification_loss(logits, labels, label_smoothing=0.1)
    assert np.isfinite(float(loss))
    acc = accuracy_topk(logits, labels)
    assert 0 <= float(acc["acc1"]) <= 100
    assert float(acc["acc5"]) >= float(acc["acc1"])


def test_classification_train_step_runs():
    cfg = small_cls_config()
    model = build_model(cfg)
    x = jnp.zeros((4, 64, 64, 3))
    v = jax.jit(lambda r, x: model.init(r, x, return_stages=False,
                                        flatten_ft=True))(
        jax.random.PRNGKey(0), x)
    tx = build_optimizer(cfg, v["params"], n_iter_per_epoch=10)
    state = TrainState.create(params=v["params"], tx=tx,
                              rng=jax.random.PRNGKey(0))
    step = jax.jit(make_classification_train_step(model, tx))
    r = np.random.RandomState(0)
    batch = {"image": jnp.asarray(r.randn(4, 64, 64, 3), jnp.float32),
             "label": jnp.asarray([0, 1, 2, 3])}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_mixup_cutmix_soft_targets():
    r = np.random.RandomState(0)
    imgs = r.rand(4, 32, 32, 3).astype(np.float32)
    labels = np.asarray([0, 1, 2, 3])
    out_imgs, targets = mixup_cutmix(imgs, labels, num_classes=5,
                                     rng=np.random.RandomState(1))
    assert out_imgs.shape == imgs.shape
    assert targets.shape == (4, 5)
    np.testing.assert_allclose(targets.sum(-1), 1.0, rtol=1e-5)
    # soft-target loss consumes mixup output
    logits = jnp.asarray(r.randn(4, 5), jnp.float32)
    loss = classification_loss(logits, jnp.asarray(targets))
    assert np.isfinite(float(loss))


def test_simmim_mask_generator():
    gen = MaskGenerator(input_size=64, mask_patch_size=16,
                        model_patch_size=4, mask_ratio=0.5)
    m = gen(np.random.RandomState(0))
    assert m.shape == (16, 16)
    assert set(np.unique(m)) <= {0, 1}
    assert 0.4 < m.mean() < 0.6
