"""Parity tests for the auxiliary LoRA layers (MTLoRAQKV split path and
LoRAQKVLinear selective-group adapters) vs the reference torch impls."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from ref_loader import install_timm_stub, reference_available  # noqa: E402

from mtlora_tpu.models.lora import (  # noqa: E402
    LoRAQKVLinear,
    LoRASpec,
    MTLoRAQKV,
)


def _ref_lora():
    install_timm_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib
    import types

    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = ["/root/reference/models"]
        sys.modules["models"] = pkg
    return importlib.import_module("models.lora")


def test_mtlora_qkv_split_consistency():
    """MTLoRAQKV == concat of three independent MTLoRALinear branches.

    (The reference's own MTLoRAQKV cannot be used as an oracle: its
    constructor forwards the rank dict into LoRALayer's ``assert r >= 0``
    (models/lora.py:306,75) and crashes — dead code kept for API parity;
    checkpoint-surgery for the SPLIT_QKV layout is covered by the
    converter tests instead.)
    """
    from mtlora_tpu.models.lora import MTLoRALinear

    spec = LoRASpec(r_shared=4, r_tasks=(4, 4), shared_scale=2.0,
                    task_scales=(1.5, 2.5))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8),
                    jnp.float32)
    mod = MTLoRAQKV(8, 8, spec=spec, has_tasks=True)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y, t = mod.apply(variables, x)
    assert y.shape == (2, 5, 24)
    assert t.shape == (2, 2, 5, 24)
    single = MTLoRALinear(8, 8, spec=spec, has_tasks=True)
    ys, ts = [], []
    for branch in ("q", "k", "v"):
        yb, tb = single.apply(
            {"params": variables["params"][branch]}, x)
        ys.append(yb)
        ts.append(tb)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(jnp.concatenate(ys, -1)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t),
                               np.asarray(jnp.concatenate(ts, -1)),
                               rtol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="no reference")
@pytest.mark.parametrize("enable", [(True, True, True),
                                    (True, False, True)])
def test_lora_qkv_linear_parity(enable):
    import torch

    ref_mod = _ref_lora()
    ref = ref_mod.LoRAQKVLinear(8, 24, n_head=2, n_query_groups=2, r=2,
                                lora_alpha=4, enable_lora=list(enable))
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.3, 0.3, generator=g))
    ref.eval()
    x = np.random.RandomState(1).randn(2, 3, 8).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.tensor(x))

    mod = LoRAQKVLinear(8, 24, n_head=2, n_query_groups=2, r=2,
                        lora_alpha=4, enable_lora=enable)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = dict(variables["params"])
    p["kernel"] = jnp.asarray(sd["linear.weight"].T)
    p["bias"] = jnp.asarray(sd["linear.bias"])
    p["lora_A"] = jnp.asarray(sd["lora_A"].T)
    p["lora_B"] = jnp.asarray(sd["lora_B"].T)
    y = mod.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)


def test_x_dropped_consumed_by_adapter_branch():
    """MTLoRALinear(x_dropped=...) must feed the pre-dropped tensor to
    the shared-adapter branch instead of drawing its own mask (the LN
    kernel's out_drop second output rides this path)."""
    from mtlora_tpu.models.lora import LoRASpec, MTLoRALinear

    spec = LoRASpec(r_shared=4, shared_scale=2.0, dropout=0.5)
    mod = MTLoRALinear(8, 12, spec=spec, has_tasks=False)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(16, 8), jnp.float32)
    xd = jnp.asarray(rs.binomial(1, 0.5, (16, 8)) * 2.0, jnp.float32) * x
    variables = mod.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(
        lambda a: jnp.asarray(rs.randn(*a.shape) * 0.1, a.dtype),
        variables["params"])
    y, _ = mod.apply({"params": p}, x, deterministic=False,
                     x_dropped=xd, rngs={"dropout": jax.random.PRNGKey(9)})
    # manual expectation: pretrained(x) + scale * (xd @ A) @ B
    pre = x @ p["kernel"] + p["bias"]
    want = pre + 2.0 * (xd @ p["lora_shared_A"]) @ p["lora_shared_B"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
