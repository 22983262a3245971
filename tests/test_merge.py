"""merge_lora_weights correctness: folding shared adapters into kernels
must leave every model output unchanged (reference merge semantics,
models/lora.py:637-641), including the flagship config's scale-4 shared
adapters and the trainable-scale / matrixv2 variants."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mtlora_tpu.models.lora import (
    LoRASpec,
    MTLoRALinear,
    MTLoRASpec,
    merge_lora_weights,
)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(
    HERE, "configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml")
TASKS = ["semseg", "normals", "sal", "human_parts"]


def _randomize_lora_b(params, seed=0):
    """lora_*_B init to zero, which would make any merge trivially
    correct — perturb them so the test has teeth."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    r = np.random.RandomState(seed)
    out = {}
    for path, v in flat.items():
        if path[-1] in ("lora_shared_B", "lora_tasks_B"):
            out[path] = jnp.asarray(
                r.randn(*v.shape).astype(np.float32) * 0.05)
        else:
            out[path] = v
    return flax.traverse_util.unflatten_dict(out)


def test_merge_flagship_model_equality():
    """Full flagship-spec model (r64/scale4 per-task, matrix mode): the
    merged params through the UNMERGED model and through the merged-spec
    fast path both reproduce the original outputs."""
    from mtlora_tpu.config import load_config
    from mtlora_tpu.models.mtl import build_mtl_model

    cfg = load_config(
        FLAGSHIP, tasks=TASKS, img_size=64,
        opts=["MODEL.SWIN.DEPTHS", "[2, 2, 2, 2]",
              "MODEL.SWIN.WINDOW_SIZE", "4",
              "AMP_ENABLE", "False"])
    model = build_mtl_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params = _randomize_lora_b(variables["params"])
    bs = variables.get("batch_stats", {})
    ref = model.apply({"params": params, "batch_stats": bs}, x)

    spec = MTLoRASpec.from_config(cfg)
    merged_params, merged_spec = merge_lora_weights(params, spec)
    assert all(s.shared_merged for s in merged_spec.stage_specs)

    # merged params through the unmerged model (B zeroed -> same outputs)
    out_unmerged_model = model.apply(
        {"params": merged_params, "batch_stats": bs}, x)
    # merged fast path: adapter GEMMs skipped on merged layers
    out_fast = model.clone(mtlora=merged_spec).apply(
        {"params": merged_params, "batch_stats": bs}, x)
    for t in TASKS:
        np.testing.assert_allclose(
            np.asarray(ref[t]), np.asarray(out_unmerged_model[t]),
            atol=1e-5, err_msg=f"unmerged-model path diverged for {t}")
        np.testing.assert_allclose(
            np.asarray(ref[t]), np.asarray(out_fast[t]),
            atol=1e-5, err_msg=f"merged fast path diverged for {t}")
    # merge actually changed the kernels (non-trivial test)
    import flax

    f0 = flax.traverse_util.flatten_dict(params)
    f1 = flax.traverse_util.flatten_dict(merged_params)
    changed = sum(
        1 for k in f0
        if k[-1] == "kernel" and not np.allclose(f0[k], f1[k]))
    assert changed > 0, "merge was a no-op"


def _unit_spec(**kw):
    base = dict(r_shared=4, r_tasks=(3, 4), shared_scale=4.0,
                task_scales=(2.0, 3.0))
    base.update(kw)
    return LoRASpec(**base)


def _run_merge_unit(spec, has_tasks, seed=1):
    mod = MTLoRALinear(8, 6, spec=spec, has_tasks=has_tasks)
    x = jnp.asarray(np.random.RandomState(seed).randn(2, 5, 8), jnp.float32)
    xt = jnp.asarray(np.random.RandomState(seed + 1).randn(2, 2, 5, 8),
                     jnp.float32) if has_tasks else None
    variables = mod.init(jax.random.PRNGKey(seed), x, xt)
    params = _randomize_lora_b(variables["params"], seed)
    ref = mod.apply({"params": params}, x, xt)
    mt = MTLoRASpec(enabled=True, tasks=("a", "b") if has_tasks else (),
                    stage_specs=(spec,))
    # wrap params under a layers_0 scope so stage resolution kicks in
    merged, mspec = merge_lora_weights({"layers_0": params}, mt)
    merged = merged["layers_0"]
    got = mod.apply({"params": merged}, x, xt)
    fast = MTLoRALinear(8, 6, spec=mspec.stage_specs[0],
                        has_tasks=has_tasks)
    got_fast = fast.apply({"params": merged}, x, xt)
    for a, b in ((ref, got), (ref, got_fast)):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=1e-5)
        if has_tasks:
            np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                       atol=1e-5)
    return params, merged


def test_merge_scale_applied_no_tasks():
    params, merged = _run_merge_unit(_unit_spec(), has_tasks=False)
    # kernel moved by exactly scale * A @ B
    delta = np.asarray(merged["kernel"]) - np.asarray(params["kernel"])
    expect = 4.0 * (np.asarray(params["lora_shared_A"])
                    @ np.asarray(params["lora_shared_B"]))
    np.testing.assert_allclose(delta, expect, atol=1e-6)


def test_merge_matrix_mode_skips_task_layers():
    """matrix mode: task outputs don't carry the shared update, so layers
    with task branches must NOT be merged."""
    params, merged = _run_merge_unit(_unit_spec(), has_tasks=True)
    np.testing.assert_allclose(np.asarray(merged["kernel"]),
                               np.asarray(params["kernel"]))
    np.testing.assert_allclose(np.asarray(merged["lora_shared_B"]),
                               np.asarray(params["lora_shared_B"]))


def test_merge_matrixv2_merges_task_layers():
    params, merged = _run_merge_unit(
        _unit_spec(shared_mode="matrixv2"), has_tasks=True)
    assert not np.allclose(np.asarray(merged["kernel"]),
                           np.asarray(params["kernel"]))


def test_merge_trainable_scale():
    params, merged = _run_merge_unit(
        _unit_spec(trainable_scale_shared=True, shared_scale=1.0),
        has_tasks=False)
    # scale param (init 1.0) is used; nudge it and re-merge to check
    params2 = dict(params)
    params2["lora_shared_scale"] = jnp.asarray([2.5], jnp.float32)
    mt = MTLoRASpec(enabled=True, tasks=(),
                    stage_specs=(_unit_spec(trainable_scale_shared=True,
                                            shared_scale=1.0),))
    merged2, _ = merge_lora_weights({"layers_0": params2}, mt)
    delta = (np.asarray(merged2["layers_0"]["kernel"])
             - np.asarray(params2["kernel"]))
    expect = 2.5 * (np.asarray(params2["lora_shared_A"])
                    @ np.asarray(params2["lora_shared_B"]))
    np.testing.assert_allclose(delta, expect, atol=1e-6)
