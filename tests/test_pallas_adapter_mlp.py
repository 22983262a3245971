"""Fused adapter MLP-tail kernel vs jnp reference (fwd + grads), interpret
mode on CPU — the reference kernel-test pattern
(kernels/window_process/unit_test.py:133-241), plus an end-to-end Mlp
equality test of the fused vs materialized task path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlora_tpu.models.lora import LoRASpec
from mtlora_tpu.models.swin import Mlp
from mtlora_tpu.ops.pallas_adapter_mlp import (
    adapter_mid_reference,
    fused_adapter_mid,
)

pytestmark = pytest.mark.quick  # always-run gate tier (kernel interpret coverage)


def case(seed, T=3, r1=4, r2=4, M=512, H4=256, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    mid1T = jnp.asarray(rs.randn(T, r1, M), dtype)
    p1 = jnp.asarray(rs.randn(M, H4), dtype)
    b1 = jnp.asarray(rs.randn(T, r1, H4) * 0.1, dtype)
    a2T = jnp.asarray(rs.randn(T, r2, H4) * 0.1, dtype)
    scales = tuple(float(s) for s in (4.0, 2.0, 1.0, 0.5, 3.0)[:T])
    return mid1T, p1, b1, a2T, scales


@pytest.mark.parametrize("M,H4", [(512, 256), (384, 128), (40, 256)])
def test_fwd_matches(M, H4):
    # M=40 exercises the full-M (single grid cell) fallback
    mid1T, p1, b1, a2T, scales = case(0, M=M, H4=H4)
    out = fused_adapter_mid(mid1T, p1, b1, a2T, scales, True)
    ref = adapter_mid_reference(mid1T, p1, b1, a2T, scales)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_token_padding_path():
    """M with no multiple-of-128 divisor above the VMEM cap forces the
    zero-padding path (the batch-16 stage-3 shape class); fwd AND grads
    must be unaffected by the padding."""
    from mtlora_tpu.ops.pallas_adapter_mlp import _plan

    M, H4 = 1000, 2048
    Mb, M2 = _plan(M, H4)
    assert M2 > M and M2 % 128 == 0 and M2 % Mb == 0
    mid1T, p1, b1, a2T, scales = case(4, M=M, H4=H4)
    out = fused_adapter_mid(mid1T, p1, b1, a2T, scales, True)
    ref = adapter_mid_reference(mid1T, p1, b1, a2T, scales)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)

    def lk(*a):
        return jnp.sum(jnp.sin(fused_adapter_mid(*a, scales, True)))

    def lr(*a):
        return jnp.sum(jnp.sin(adapter_mid_reference(*a, scales)))

    gk = jax.grad(lk, argnums=(0, 1, 2, 3))(mid1T, p1, b1, a2T)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(mid1T, p1, b1, a2T)
    for k, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   atol=2e-3, rtol=2e-4)


def test_fwd_matches_bf16():
    mid1T, p1, b1, a2T, scales = case(1, dtype=jnp.bfloat16)
    out = fused_adapter_mid(mid1T, p1, b1, a2T, scales, True)
    ref = adapter_mid_reference(mid1T, p1, b1, a2T, scales)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.15, rtol=0.05)


def test_grads_match():
    mid1T, p1, b1, a2T, scales = case(2)

    def lk(*a):
        return jnp.sum(jnp.sin(fused_adapter_mid(*a, scales, True)))

    def lr(*a):
        return jnp.sum(jnp.sin(adapter_mid_reference(*a, scales)))

    gk = jax.grad(lk, argnums=(0, 1, 2, 3))(mid1T, p1, b1, a2T)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(mid1T, p1, b1, a2T)
    for name, k, r in zip(("mid1T", "p1", "b1", "a2T"), gk, gr):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), atol=2e-3, rtol=2e-4,
            err_msg=f"grad mismatch for {name}")


def test_mismatched_ranks():
    # fc1 rank != fc2 rank
    mid1T, p1, b1, a2T, scales = case(3, r1=2, r2=6)
    out = fused_adapter_mid(mid1T, p1, b1, a2T, scales, True)
    ref = adapter_mid_reference(mid1T, p1, b1, a2T, scales)
    assert out.shape == (3, 6, 512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def _mlp(use_fused, spec):
    return Mlp(in_features=32, hidden_features=128, spec=spec,
               fc1_tasks=True, fc2_tasks=True, drop=0.0,
               freeze_pretrained=True, use_pallas_adapter=use_fused)


SPEC = LoRASpec(r_shared=8, r_tasks=(4, 2, 4), shared_scale=4.0,
                task_scales=(4.0, 2.0, 4.0), shared_mode="matrix")


def test_mlp_fused_path_matches_materialized():
    """End-to-end Mlp: fused task path == materialized task path, fwd and
    grads, including uneven per-task ranks (rank-mask padding)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 64, 32), jnp.float32)
    xt = jnp.asarray(rs.randn(3, 2, 64, 32), jnp.float32)

    ref_mlp, fused_mlp = _mlp(False, SPEC), _mlp(True, SPEC)
    variables = ref_mlp.init(jax.random.PRNGKey(0), x, xt)
    # param trees must be identical between the two paths
    assert (jax.tree.structure(fused_mlp.init(jax.random.PRNGKey(0), x, xt))
            == jax.tree.structure(variables))

    y_r, t_r = ref_mlp.apply(variables, x, xt)
    y_f, t_f = fused_mlp.apply(variables, x, xt)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_r),
                               atol=1e-5, rtol=1e-5)

    def loss(mlp, v, x, xt):
        y, t = mlp.apply(v, x, xt)
        return jnp.mean(y ** 2) + jnp.mean(jnp.sin(t))

    g_r = jax.grad(lambda v: loss(ref_mlp, v, x, xt))(variables)
    g_f = jax.grad(lambda v: loss(fused_mlp, v, x, xt))(variables)
    flat_r = jax.tree_util.tree_flatten_with_path(g_r)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    for (pr, vr), (pf, vf) in zip(flat_r, flat_f):
        assert pr == pf
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vr), atol=2e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pr)}")


def test_mlp_fused_gate_fallback():
    """matrixv2 / trainable scales / addition must NOT take the fused
    path (it would be numerically wrong) — outputs still match the
    materialized semantics."""
    for spec in (
        LoRASpec(r_shared=8, r_tasks=(4, 4, 4), shared_scale=1.0,
                 task_scales=(1.0, 1.0, 1.0), shared_mode="matrixv2"),
        LoRASpec(r_shared=8, r_tasks=(4, 4, 4), shared_scale=1.0,
                 task_scales=(1.0, 1.0, 1.0), shared_mode="matrix",
                 trainable_scale_per_task=True),
    ):
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(2, 16, 32), jnp.float32)
        xt = jnp.asarray(rs.randn(3, 2, 16, 32), jnp.float32)
        ref_mlp, fused_mlp = _mlp(False, spec), _mlp(True, spec)
        variables = ref_mlp.init(jax.random.PRNGKey(0), x, xt)
        y_r, t_r = ref_mlp.apply(variables, x, xt)
        y_f, t_f = fused_mlp.apply(variables, x, xt)
        np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_r),
                                   atol=1e-6)


def test_cheap_gelu_matches_exact_and_is_overflow_safe():
    """The bf16 kernels' tanh/sigmoid-form gelu: max |err| vs the exact
    erf form must stay an order below bf16 round-off, INCLUDING at
    large-magnitude activations where the unclamped sigmoid overflowed
    to NaN (inf * 0 in the reciprocal Newton step; round-4 regression,
    caught by the on-TPU fast equality gate)."""
    from mtlora_tpu.ops.pallas_adapter_mlp import _gelu_fwd, _gelu_pair

    z = jnp.asarray(
        np.concatenate([np.linspace(-6, 6, 4001),
                        [-1e4, -50.0, -12.0, 12.0, 50.0, 1e4]]),
        jnp.float32)
    ref = jax.nn.gelu(z, approximate=False)
    h = _gelu_fwd(z, True)
    assert bool(jnp.isfinite(h).all())
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref), atol=6e-4)
    h2, dg = _gelu_pair(z, True)
    assert bool(jnp.isfinite(dg).all())
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h), atol=0)
    dref = jax.vmap(jax.grad(
        lambda v: jax.nn.gelu(v, approximate=False)))(z)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dref),
                               atol=2e-3)
