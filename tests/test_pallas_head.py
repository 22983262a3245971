"""Interpret-mode equality for the fused HRNet-head kernel
(ops/pallas_head.py): expand -> BN(affine) -> ReLU -> pred with BN batch
statistics computed from the input covariance. Compiled-Mosaic coverage
at the flagship shape runs on TPU via tools/kernel_equality_tpu.py head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mtlora_tpu.models.heads import HighResolutionHead
from mtlora_tpu.ops.pallas_head import (
    bn_stats_from_x,
    fused_head_mlp,
    head_mlp_reference,
    head_mlp_supported,
)

M, C, n = 256, 48, 7
O = 4 * C


def _inputs(dtype, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(M, C), dtype)
    ek = jnp.asarray(rs.randn(C, O) * 0.1, dtype)
    eb = jnp.asarray(rs.randn(O) * 0.1, jnp.float32)[None]
    pk = jnp.asarray(rs.randn(O, n) * 0.1, dtype)
    pb = jnp.asarray(rs.randn(n) * 0.1, jnp.float32)[None]
    mu, var = bn_stats_from_x(x, ek, eb[0])
    inv = jax.lax.rsqrt(var + 1e-5)
    mul = inv[None]
    add = (-mu * inv)[None]
    return x, ek, eb, mul, add, pk, pb


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 3e-2)])
def test_fwd_matches_reference(dtype, tol):
    args = _inputs(dtype)
    yk = fused_head_mlp(*args, interpret=True)
    yr = head_mlp_reference(*args)
    scale = max(float(jnp.abs(yr.astype(jnp.float32)).max()), 1e-6)
    rel = float(jnp.abs(yk.astype(jnp.float32)
                        - yr.astype(jnp.float32)).max()) / scale
    assert rel < tol, rel


def test_grads_match_reference():
    args = _inputs(jnp.float32, seed=1)
    argnums = tuple(range(7))

    def lk(*a):
        return jnp.mean(fused_head_mlp(*a, interpret=True) ** 2)

    def lr(*a):
        return jnp.mean(head_mlp_reference(*a) ** 2)

    gk = jax.grad(lk, argnums)(*args)
    gr = jax.grad(lr, argnums)(*args)
    for name, a, b in zip("x ek eb mul add pk pb".split(), gk, gr):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 3e-5, (name, rel)


def test_bn_stats_match_materialized_hidden():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(M, C), jnp.float32)
    ek = jnp.asarray(rs.randn(C, O) * 0.1, jnp.float32)
    eb = jnp.asarray(rs.randn(O), jnp.float32)
    mu, var = bn_stats_from_x(x, ek, eb)
    h = x @ ek + eb
    np.testing.assert_allclose(np.asarray(mu), np.asarray(h.mean(0)),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(h.var(0)),
                               atol=1e-3, rtol=1e-3)


def test_bn_stats_gradient_matches_materialized():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(M, C), jnp.float32)
    ek = jnp.asarray(rs.randn(C, O) * 0.1, jnp.float32)
    eb = jnp.asarray(rs.randn(O), jnp.float32)

    def via_cov(x, ek, eb):
        mu, var = bn_stats_from_x(x, ek, eb)
        return jnp.sum(mu * jnp.arange(O)) + jnp.sum(var * 0.5)

    def via_h(x, ek, eb):
        h = x @ ek + eb
        return (jnp.sum(h.mean(0) * jnp.arange(O))
                + jnp.sum(h.var(0) * 0.5))

    gc = jax.grad(via_cov, (0, 1, 2))(x, ek, eb)
    gh = jax.grad(via_h, (0, 1, 2))(x, ek, eb)
    for name, a, b in zip("x ek eb".split(), gc, gh):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 2e-4, (name, rel)


def _head_feats(rs, B=2, r0=8):
    chans = (18, 36, 72, 144)
    res = (r0, r0 // 2, r0 // 4, r0 // 4)
    return [jnp.asarray(rs.randn(B, r, r, c), jnp.float32)
            for r, c in zip(res, chans)]


@pytest.mark.parametrize("train", [True, False])
def test_fused_head_module_matches_module_path(train):
    """HighResolutionHead(use_pallas=True) (kernel, interpret on CPU)
    vs the ConvBNRelu module path: same params, same logits, same
    running-stats updates; checkpoint tree paths identical."""
    rs = np.random.RandomState(4)
    feats = _head_feats(rs)
    mod = HighResolutionHead(num_outputs=n, use_pallas=False)
    fus = HighResolutionHead(num_outputs=n, use_pallas=True)
    variables = mod.init(jax.random.PRNGKey(0), feats)
    vf = fus.init(jax.random.PRNGKey(0), feats)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vf))

    ym, sm = mod.apply(variables, feats, train=train,
                       mutable=["batch_stats"])
    yf, sf = fus.apply(variables, feats, train=train,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ym),
                               atol=1e-3, rtol=1e-3)
    for (pm, lm), (pf, lf) in zip(
            jax.tree_util.tree_leaves_with_path(sm),
            jax.tree_util.tree_leaves_with_path(sf)):
        assert pm == pf
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lm),
                                   atol=1e-3, rtol=1e-3, err_msg=str(pm))


def test_fused_head_module_grads_match(train=True):
    rs = np.random.RandomState(5)
    feats = _head_feats(rs)
    mod = HighResolutionHead(num_outputs=n, use_pallas=False)
    fus = HighResolutionHead(num_outputs=n, use_pallas=True)
    variables = mod.init(jax.random.PRNGKey(0), feats)

    def loss(head):
        def f(params, feats):
            y, _ = head.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                feats, train=True, mutable=["batch_stats"])
            return jnp.mean(y ** 2)
        return f

    gm = jax.grad(loss(mod))(variables["params"], feats)
    gf = jax.grad(loss(fus))(variables["params"], feats)
    gscale = max(float(jnp.abs(l).max())
                 for l in jax.tree_util.tree_leaves(gm))
    for (pm, lm), (pf, lf) in zip(
            jax.tree_util.tree_leaves_with_path(gm),
            jax.tree_util.tree_leaves_with_path(gf)):
        assert pm == pf
        # expand/conv/bias: train-mode BN is invariant to a pre-BN bias
        # shift, so its true grad is zero and both paths hold only
        # round-off noise — scale against the global grad magnitude
        scale = max(float(jnp.abs(lm).max()), 0.02 * gscale)
        rel = float(jnp.abs(lf - lm).max()) / scale
        assert rel < 2e-3, (pm, rel)


def test_supported_shapes():
    assert head_mlp_supported(100352, 270, 21)       # flagship 448
    assert head_mlp_supported(2 * 8 * 8, 270, 21)    # tiny fixture
    assert not head_mlp_supported(997, 270, 21)      # prime row count
