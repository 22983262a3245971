"""Fused LayerNorm+GEMM+shared-LoRA kernel (ops/pallas_ln_lora.py):
kernel-vs-reference equality and whole-backbone equality of the
use_pallas_ln path against the module path, interpret mode on CPU
(deterministic — the in-kernel dropout PRNG is TPU-only)."""

import jax
import jax.numpy as jnp
import numpy as np

from mtlora_tpu.models.lora import LoRASpec, MTLoRASpec
from mtlora_tpu.models.swin import SwinTransformerMTLoRA
from mtlora_tpu.ops.pallas_ln_lora import (
    fused_ln_lora_linear,
    ln_lora_reference,
)


def _case(seed, M=256, C=96, O=288, r=64):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(M, C), jnp.float32)
    g = jnp.asarray(rs.randn(C) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    W = jnp.asarray(rs.randn(C, O) * 0.05, jnp.float32)
    bias = jnp.asarray(rs.randn(O) * 0.1, jnp.float32)
    A = jnp.asarray(rs.randn(C, r) * 0.1, jnp.float32)
    B = jnp.asarray(rs.randn(r, O) * 0.1, jnp.float32)
    return x, g, b, W, bias, A, B


def test_fwd_and_p_match():
    x, g, b, W, bias, A, B = _case(0)
    seed = jnp.zeros((1,), jnp.int32)
    y, p = fused_ln_lora_linear(x, g, b, W, bias, A, B, seed, 4.0, 0.0,
                                True, False, False, interpret=True)
    yr, pr = ln_lora_reference(x, g, b, W, bias, A, B, 4.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p), np.asarray(pr), atol=2e-5,
                               rtol=1e-5)


def test_fwd_act_matches():
    x, g, b, W, bias, A, B = _case(5)
    seed = jnp.zeros((1,), jnp.int32)
    y = fused_ln_lora_linear(x, g, b, W, bias, A, B, seed, 4.0, 0.0,
                             False, True, False, interpret=True)
    yr, _ = ln_lora_reference(x, g, b, W, bias, A, B, 4.0, act=True)
    # the in-kernel gelu uses the A&S erf approximation (1.5e-7 abs per
    # element, amplified through downstream contractions)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-4,
                               rtol=1e-4)

    def lk(x, A):
        return jnp.sum(jnp.sin(fused_ln_lora_linear(
            x, g, b, W, bias, A, B, seed, 4.0, 0.0, False, True, False, interpret=True)))

    def lr(x, A):
        return jnp.sum(jnp.sin(ln_lora_reference(
            x, g, b, W, bias, A, B, 4.0, act=True)[0]))

    gk = jax.grad(lk, argnums=(0, 1))(x, A)
    gr = jax.grad(lr, argnums=(0, 1))(x, A)
    for name, k, r in zip("x A".split(), gk, gr):
        scale = max(float(jnp.abs(r).max()), 1e-6)
        rel = float(jnp.abs(k - r).max()) / scale
        assert rel < 1e-3, f"act grad mismatch for {name}: rel {rel}"


def test_grads_match():
    x, g, b, W, bias, A, B = _case(1)
    seed = jnp.zeros((1,), jnp.int32)

    def lk(x, g, b, A, B):
        return jnp.sum(jnp.sin(fused_ln_lora_linear(
            x, g, b, W, bias, A, B, seed, 2.0, 0.0, False, False, False, interpret=True)))

    def lr(x, g, b, A, B):
        return jnp.sum(jnp.sin(ln_lora_reference(
            x, g, b, W, bias, A, B, 2.0)[0]))

    gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(x, g, b, A, B)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(x, g, b, A, B)
    for name, k, r in zip("x gamma beta A B".split(), gk, gr):
        scale = max(float(jnp.abs(r).max()), 1e-6)
        rel = float(jnp.abs(k - r).max()) / scale
        assert rel < 2e-5, f"grad mismatch for {name}: rel {rel}"


def _backbone(use_ln):
    spec = LoRASpec(r_shared=8, r_tasks=(2, 2), shared_scale=2.0,
                    task_scales=(1.0, 1.0), shared_mode="matrix")
    mtl = MTLoRASpec(enabled=True, tasks=("a", "b"),
                     stage_specs=(spec, spec), freeze_pretrained=True)
    return SwinTransformerMTLoRA(
        img_size=32, embed_dim=16, depths=(1, 2), num_heads=(2, 2),
        window_size=4, mtlora=mtl, drop_path_rate=0.0,
        use_pallas_ln=use_ln, use_pallas_adapter=use_ln)


def test_backbone_ln_path_matches_module_path():
    """Whole backbone (incl. the factored fc1 tail + shifted blocks):
    use_pallas_ln=True must reproduce the nn.LayerNorm path exactly with
    the same parameters; param trees must be identical."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    ref, fused = _backbone(False), _backbone(True)
    variables = ref.init(jax.random.PRNGKey(0), x)
    v2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    chk = jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), variables, v2)
    del chk

    out_r = ref.apply(variables, x)
    out_f = fused.apply(variables, x)
    for (xr, tr), (xf, tf) in zip(out_r, out_f):
        np.testing.assert_allclose(np.asarray(xf), np.asarray(xr),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(tf), np.asarray(tr),
                                   atol=2e-4, rtol=2e-4)

    def loss(model, v):
        outs = model.apply(v, x)
        return sum(jnp.mean(jnp.sin(s)) + jnp.mean(jnp.cos(t))
                   for (s, t) in outs)

    g_r = jax.grad(lambda v: loss(ref, v))(variables)
    g_f = jax.grad(lambda v: loss(fused, v))(variables)
    for (pr, vr), (pf, vf) in zip(
            jax.tree_util.tree_flatten_with_path(g_r)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        assert pr == pf
        scale = max(float(jnp.abs(vr).max()), 1e-6)
        rel = float(jnp.abs(vf - vr).max()) / scale
        # 1e-3: the fused path's erf-approximated gelu (and its exact
        # derivative form) differ from jax.nn.gelu at the ~1e-7 abs per
        # element level, amplified through the depth of the backbone
        assert rel < 1e-3, (
            f"grad mismatch at {jax.tree_util.keystr(pr)}: rel {rel}")


def test_train_w_grads_match():
    """train_w=True: the kernel's in-kernel dW/db accumulation (the
    trainable PatchMerging-reduction path) must match autodiff through
    the jnp reference."""
    x, g, b, W, bias, A, B = _case(9, M=256, C=64, O=96, r=8)
    seed = jnp.zeros((1,), jnp.int32)

    def lk(x, W, bias):
        return jnp.sum(jnp.sin(fused_ln_lora_linear(
            x, g, b, W, bias, A, B, seed, 2.0, 0.0, False, False, False,
            train_w=True, interpret=True)))

    def lr(x, W, bias):
        return jnp.sum(jnp.sin(ln_lora_reference(
            x, g, b, W, bias, A, B, 2.0)[0]))

    gk = jax.grad(lk, argnums=(0, 1, 2))(x, W, bias)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, W, bias)
    for name, k, r in zip("x W bias".split(), gk, gr):
        scale = max(float(jnp.abs(r).max()), 1e-6)
        rel = float(jnp.abs(k - r).max()) / scale
        assert rel < 2e-5, f"train_w grad mismatch for {name}: rel {rel}"


def test_patchmerging_pallas_matches_fold():
    """PatchMerging's LN-kernel path (use_pallas_ln) must reproduce the
    algebraic fold / module path exactly, fwd and grads."""
    from mtlora_tpu.models.swin import PatchMerging
    from mtlora_tpu.models.lora import LoRASpec

    H = W = 8
    C = 16
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, H * W, C), jnp.float32)
    for freeze in (False, True):
        pk = PatchMerging((H, W), C, LoRASpec(r_shared=0),
                          freeze_pretrained=freeze, use_pallas_ln=True)
        pf = PatchMerging((H, W), C, LoRASpec(r_shared=0),
                          freeze_pretrained=freeze, use_pallas_ln=False)
        variables = pk.init(jax.random.PRNGKey(0), x)
        yk, _ = pk.apply(variables, x)
        yf, _ = pf.apply(variables, x)
        np.testing.assert_allclose(np.asarray(yk), np.asarray(yf),
                                   atol=2e-5, rtol=2e-5)

        def loss(m):
            def f(p, x):
                return jnp.sum(jnp.sin(m.apply({"params": p}, x)[0]))
            return f

        gk = jax.grad(loss(pk))(variables["params"], x)
        gf = jax.grad(loss(pf))(variables["params"], x)
        import flax

        fk = flax.traverse_util.flatten_dict(gk)
        ff = flax.traverse_util.flatten_dict(gf)
        assert set(fk) == set(ff)
        for path in sorted(fk):
            np.testing.assert_allclose(
                np.asarray(fk[path]), np.asarray(ff[path]),
                atol=3e-5, rtol=3e-5,
                err_msg=f"{path} (freeze={freeze})")


def test_merge_ln_kernel_matches_reference():
    """fused_merge_ln_linear (in-VMEM 2x2 merge + LN + GEMM) vs the jnp
    reference: fwd and all grads, train_w on and off."""
    from mtlora_tpu.ops.pallas_ln_lora import (
        fused_merge_ln_linear,
        merge_ln_reference,
    )

    rs = np.random.RandomState(11)
    R, Wh, C = 12, 8, 16
    x = jnp.asarray(rs.randn(R, 2, Wh, 2 * C), jnp.float32)
    g = jnp.asarray(rs.randn(4 * C) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(rs.randn(4 * C) * 0.1, jnp.float32)
    W = jnp.asarray(rs.randn(4 * C, 2 * C) * 0.05, jnp.float32)

    y = fused_merge_ln_linear(x, g, b, W, False, True)
    yr = merge_ln_reference(x, g, b, W)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=2e-5, rtol=1e-5)

    for train_w in (False, True):
        def lk(x, g, b, W):
            return jnp.sum(jnp.sin(fused_merge_ln_linear(
                x, g, b, W, train_w, True)))

        def lr(x, g, b, W):
            return jnp.sum(jnp.sin(merge_ln_reference(x, g, b, W)))

        gk = jax.grad(lk, argnums=(0, 1, 2, 3))(x, g, b, W)
        gr = jax.grad(lr, argnums=(0, 1, 2, 3))(x, g, b, W)
        for name, k, r in zip("x gamma beta W".split(), gk, gr):
            if name == "W" and not train_w:
                assert float(jnp.abs(k).max()) == 0.0
                continue
            scale = max(float(jnp.abs(r).max()), 1e-6)
            rel = float(jnp.abs(k - r).max()) / scale
            assert rel < 2e-5, (
                f"merge grad mismatch for {name} (train_w={train_w}):"
                f" rel {rel}")


def test_patchmerging_merge_kernel_matches_fold():
    """PatchMerging with W/2 sublane-tileable (the merge-kernel path)
    must reproduce the algebraic fold, fwd and grads."""
    from mtlora_tpu.models.swin import PatchMerging
    from mtlora_tpu.models.lora import LoRASpec
    import flax

    H = W = 16
    C = 16
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(3, H * W, C), jnp.float32)
    for freeze in (False, True):
        pk = PatchMerging((H, W), C, LoRASpec(r_shared=0),
                          freeze_pretrained=freeze, use_pallas_ln=True)
        pf = PatchMerging((H, W), C, LoRASpec(r_shared=0),
                          freeze_pretrained=freeze, use_pallas_ln=False)
        variables = pk.init(jax.random.PRNGKey(0), x)
        yk, _ = pk.apply(variables, x)
        yf, _ = pf.apply(variables, x)
        np.testing.assert_allclose(np.asarray(yk), np.asarray(yf),
                                   atol=2e-5, rtol=2e-5)

        def loss(m):
            def f(p, x):
                return jnp.sum(jnp.sin(m.apply({"params": p}, x)[0]))
            return f

        gk = jax.grad(loss(pk))(variables["params"], x)
        gf = jax.grad(loss(pf))(variables["params"], x)
        fk = flax.traverse_util.flatten_dict(gk)
        ff = flax.traverse_util.flatten_dict(gf)
        assert set(fk) == set(ff)
        for path in sorted(fk):
            np.testing.assert_allclose(
                np.asarray(fk[path]), np.asarray(ff[path]),
                atol=3e-5, rtol=3e-5,
                err_msg=f"{path} (freeze={freeze})")
