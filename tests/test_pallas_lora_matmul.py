"""Fused LoRA-GEMM kernel vs naive jnp composition (fwd + grads),
interpret mode on CPU — the reference kernel-test pattern."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlora_tpu.ops.pallas_lora_matmul import lora_matmul


def case(seed, M=70, K=96, N=160, r=8, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(2, M, K) * 0.5, dtype)
    w = jnp.asarray(rs.randn(K, N) * 0.1, dtype)
    a = jnp.asarray(rs.randn(K, r) * 0.1, dtype)
    b = jnp.asarray(rs.randn(r, N) * 0.1, dtype)
    return x, w, a, b


def naive(x, xd, w, a, b, s):
    return (x @ w + ((xd @ a) @ b) * s).astype(x.dtype)


def test_fwd_matches():
    x, w, a, b = case(0)
    y = lora_matmul(x, x, w, a, b, 2.0, True, True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(naive(x, x, w, a, b, 2.0)),
                               atol=1e-4, rtol=1e-4)


def test_grads_match_same_input():
    x, w, a, b = case(1)

    def lf(x, a, b):
        return jnp.sum(jnp.sin(lora_matmul(x, x, w, a, b, 1.5, True,
                                           True)))

    def ln(x, a, b):
        return jnp.sum(jnp.sin(naive(x, x, w, a, b, 1.5)))

    gf = jax.grad(lf, argnums=(0, 1, 2))(x, a, b)
    gn = jax.grad(ln, argnums=(0, 1, 2))(x, a, b)
    for f, n in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(f), np.asarray(n),
                                   atol=2e-4, rtol=2e-4)


def test_grads_match_dropout_input():
    x, w, a, b = case(2)
    mask = jnp.asarray(np.random.RandomState(3).rand(*x.shape) > 0.1,
                       x.dtype)

    def lf(x, a, b):
        xd = x * mask
        return jnp.sum(jnp.cos(lora_matmul(x, xd, w, a, b, 0.7, False,
                                           True)))

    def ln(x, a, b):
        xd = x * mask
        return jnp.sum(jnp.cos(naive(x, xd, w, a, b, 0.7)))

    gf = jax.grad(lf, argnums=(0, 1, 2))(x, a, b)
    gn = jax.grad(ln, argnums=(0, 1, 2))(x, a, b)
    for f, n in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(f), np.asarray(n),
                                   atol=2e-4, rtol=2e-4)


def test_frozen_w_gets_zero_grad():
    x, w, a, b = case(4)
    g = jax.grad(lambda w: jnp.sum(
        lora_matmul(x, x, w, a, b, 1.0, True, True)))(w)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_unaligned_shapes():
    # exercise padding: M=35, K=50, N=70, r=4
    x, w, a, b = case(5, M=35, K=50, N=70, r=4)
    y = lora_matmul(x, x, w, a, b, 3.0, True, True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(naive(x, x, w, a, b, 3.0)),
                               atol=1e-4, rtol=1e-4)
