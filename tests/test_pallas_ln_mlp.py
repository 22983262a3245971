"""Interpret-mode equality for the whole-MLP fusion kernel
(ops/pallas_ln_mlp.py): LN -> fc1 -> gelu -> fc2 with shared LoRA on
both layers, for blocks without task streams. Compiled-Mosaic coverage
at flagship shapes runs on TPU via tools/kernel_equality_tpu.py lnmlp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlora_tpu.ops.pallas_ln_mlp import fused_ln_mlp, ln_mlp_reference

M, C, H4, R = 256, 32, 128, 8


def _inputs(dtype, seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rs.randn(*s) * 0.1, dtype)
    x = jnp.asarray(rs.randn(M, C) * 0.5, dtype)
    gamma = jnp.asarray(rs.randn(C) * 0.1 + 1, dtype)
    beta = mk(C)
    w1, b1, a1, br1 = mk(C, H4), mk(H4), mk(C, R), mk(R, H4)
    w2, b2, a2, br2 = mk(H4, C), mk(C), mk(H4, R), mk(R, C)
    return x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 3e-2)])
def test_fwd_matches_reference(dtype, tol):
    args = _inputs(dtype)
    seed = jnp.zeros((2,), jnp.int32)
    yk = fused_ln_mlp(*args, seed, 4.0, 4.0, 0.0, interpret=True)
    yr = ln_mlp_reference(*args, 4.0, 4.0)
    scale = max(float(jnp.abs(yr.astype(jnp.float32)).max()), 1e-6)
    rel = float(jnp.abs(yk.astype(jnp.float32)
                        - yr.astype(jnp.float32)).max()) / scale
    assert rel < tol, rel


def test_scale_zero_skips_adapters():
    args = _inputs(jnp.float32, seed=3)
    seed = jnp.zeros((2,), jnp.int32)
    yk = fused_ln_mlp(*args, seed, 0.0, 0.0, 0.0, interpret=True)
    yr = ln_mlp_reference(*args, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_reference():
    args = _inputs(jnp.float32, seed=1)
    seed = jnp.zeros((2,), jnp.int32)
    # trainable: x, gamma, beta, a1, br1, a2, br2 (indices 0,1,2,5,6,9,10)
    argnums = (0, 1, 2, 5, 6, 9, 10)

    def lk(*a):
        return jnp.mean(fused_ln_mlp(*a, seed, 4.0, 4.0, 0.0,
                                     interpret=True) ** 2)

    def lr(*a):
        return jnp.mean(ln_mlp_reference(*a, 4.0, 4.0) ** 2)

    gk = jax.grad(lk, argnums=argnums)(*args)
    gr = jax.grad(lr, argnums=argnums)(*args)
    names = ("dx", "dgamma", "dbeta", "dA1", "dB1", "dA2", "dB2")
    for nm, k, r in zip(names, gk, gr):
        scale = max(float(jnp.abs(r).max()), 1e-6)
        rel = float(jnp.abs(k - r).max()) / scale
        assert rel < 5e-5, f"{nm}: rel {rel}"
    # frozen pretrained: zero cotangents
    gw = jax.grad(lk, argnums=(3, 4, 7, 8))(*args)
    for nm, g in zip(("dW1", "db1", "dW2", "db2"), gw):
        assert float(jnp.abs(g).max()) == 0.0, nm


def test_mlp_module_mega_path_matches_unfused(monkeypatch):
    """The whole-MLP kernel path inside Mlp must reproduce the unfused
    module path exactly (same params, deterministic), fwd and grads."""
    import flax

    from mtlora_tpu.models import swin as swin_mod
    from mtlora_tpu.models.lora import LoRASpec

    spec = LoRASpec(r_shared=8, r_tasks=(), shared_scale=4.0,
                    task_scales=(), dropout=0.0)
    mlp = swin_mod.Mlp(in_features=C, hidden_features=H4, spec=spec,
                       fc1_tasks=False, fc2_tasks=False,
                       freeze_pretrained=True)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(2, M // 2, C) * 0.5, jnp.float32)
    gamma = jnp.asarray(rs.randn(C) * 0.1 + 1, jnp.float32)
    beta = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0), x, ln2=(gamma, beta))

    def run(params, x, fusible):
        if not fusible:
            monkeypatch.setattr(swin_mod, "_ln_mlp_fusible",
                                lambda *a, **k: False)
        else:
            monkeypatch.undo()
        y, t = mlp.apply({"params": params}, x, ln2=(gamma, beta))
        assert t is None
        return y

    yk = run(variables["params"], x, True)
    yu = run(variables["params"], x, False)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yu),
                               atol=3e-5, rtol=3e-5)

    def loss(fusible):
        def f(p):
            return jnp.sum(jnp.sin(run(p, x, fusible)))
        return f

    gk = jax.grad(loss(True))(variables["params"])
    gu = jax.grad(loss(False))(variables["params"])
    fk = flax.traverse_util.flatten_dict(gk)
    fu = flax.traverse_util.flatten_dict(gu)
    assert set(fk) == set(fu)
    for path in sorted(fk):
        np.testing.assert_allclose(np.asarray(fk[path]),
                                   np.asarray(fu[path]),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=str(path))
