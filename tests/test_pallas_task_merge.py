"""Factored-task PatchMerging kernel (ops/pallas_task_merge.py) vs the
expand-then-merge oracle, interpret mode on CPU: forward and full
gradient parity, with and without stochastic-depth coefficients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlora_tpu.models.lora import FactoredTasks, TaskStream
from mtlora_tpu.ops.pallas_task_merge import (
    task_merge_down,
    task_merge_reference,
    task_merge_supported,
)

T, B, H, W, C = 3, 2, 16, 16, 32
R1, R2 = 4, 3
L = H * W
M = B * L


def _mk(seed, coefs):
    r = np.random.RandomState(seed)

    def f(*s):
        return jnp.asarray(r.randn(*s).astype(np.float32)) * 0.5

    keep = 0.8
    c1 = c2 = None
    if coefs:
        c1 = jnp.asarray(
            (r.rand(T, B, 1) < keep).astype(np.float32) / keep)
        c2 = jnp.asarray(
            (r.rand(T, B, 1) < keep).astype(np.float32) / keep)
    stream = TaskStream(
        base=f(B, L, C), pre=f(B, L, C), midT=f(T, R1, M),
        B=f(T, R1, C), scales=tuple(float(s) for s in
                                    r.uniform(0.5, 2.0, T)),
        coef=c1)
    f2 = FactoredTasks(
        pretrained=f(B, L, C), midT=f(T, R2, M), B=f(T, R2, C),
        scales=tuple(float(s) for s in r.uniform(0.5, 2.0, T)))
    gamma = f(4 * C) + 1.0
    beta = f(4 * C)
    kern = f(4 * C, 2 * C)
    return stream, f2, c2, gamma, beta, kern


@pytest.mark.parametrize("coefs", [False, True])
def test_task_merge_forward(coefs):
    assert task_merge_supported(B * H // 2, W // 2, C, T, R1 + R2)
    stream, f2, c2, g, b, k = _mk(0, coefs)
    y = task_merge_down(stream, f2, c2, g, b, k, H, W,
                        train_w=True, interpret=True)
    yr = task_merge_reference(stream, f2, c2, g, b, k, H, W)
    assert y.shape == (T, B, L // 4, 2 * C)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("coefs", [False, True])
@pytest.mark.parametrize("train_w", [False, True])
def test_task_merge_grads(coefs, train_w):
    stream, f2, c2, g, b, k = _mk(1, coefs)
    probe = jnp.asarray(
        np.random.RandomState(2).randn(T, B, L // 4, 2 * C)
        .astype(np.float32))

    def loss_k(base, pre, p2, m1, b1, m2, b2, g, be, kk):
        s = stream._replace(base=base, pre=pre, midT=m1, B=b1)
        ff = f2._replace(pretrained=p2, midT=m2, B=b2)
        y = task_merge_down(s, ff, c2, g, be, kk, H, W,
                            train_w=train_w, interpret=True)
        return jnp.sum(y * probe)

    def loss_r(base, pre, p2, m1, b1, m2, b2, g, be, kk):
        s = stream._replace(base=base, pre=pre, midT=m1, B=b1)
        ff = f2._replace(pretrained=p2, midT=m2, B=b2)
        y = task_merge_reference(s, ff, c2, g, be, kk, H, W)
        return jnp.sum(y * probe)

    args = (stream.base, stream.pre, f2.pretrained, stream.midT,
            stream.B, f2.midT, f2.B, g, b, k)
    gk = jax.grad(loss_k, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(10)))(*args)
    names = ["base", "pre", "p2", "mid1", "B1", "mid2", "B2",
             "gamma", "beta", "kernel"]
    for n, a, e in zip(names, gk, gr):
        if n == "kernel" and not train_w:
            e = jnp.zeros_like(e)  # frozen reduction contract
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=5e-4, atol=5e-4,
            err_msg=n)
