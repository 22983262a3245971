"""Meter parity vs the reference evaluation/ package on synthetic data.

Each reference meter is fed identical synthetic (pred, gt) pairs in its
native torch layout and compared to the jit-safe accumulator meters.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from ref_loader import install_timm_stub, reference_available  # noqa: E402

from mtlora_tpu.evaluation import meters as M  # noqa: E402

pytestmark = [pytest.mark.skipif(not reference_available(),
                                 reason="no reference"),
              pytest.mark.quick]  # always-run gate tier


def _ref_eval(name):
    install_timm_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib
    return importlib.import_module(f"evaluation.{name}")


def _batches(seed, n_batches=2, b=2, h=24, w=24):
    r = np.random.RandomState(seed)
    for _ in range(n_batches):
        yield r


def test_semseg_meter_parity():
    import torch
    ref_mod = _ref_eval("eval_semseg")

    class _Cfg:
        pass

    ref = ref_mod.SemsegMeter("PASCALContext", _Cfg())
    mine = M.SemsegMeter("PASCALContext")
    st = mine.init()
    r = np.random.RandomState(0)
    for _ in range(3):
        pred = r.randint(0, 21, (2, 24, 24))
        gt = r.randint(0, 21, (2, 24, 24)).astype(np.int64)
        gt[0, :4] = 255
        ref.update(torch.tensor(pred), torch.tensor(gt))
        st = mine.update(st, pred, gt)
    a = ref.get_score(verbose=False)
    b = mine.compute(st)
    np.testing.assert_allclose(a["mIoU"], b["mIoU"], rtol=1e-9)
    np.testing.assert_allclose(a["jaccards_all_categs"],
                               b["jaccards_all_categs"], rtol=1e-9)


def test_human_parts_meter_parity():
    import torch
    ref_mod = _ref_eval("eval_human_parts")
    ref = ref_mod.HumanPartsMeter("PASCALContext")
    mine = M.HumanPartsMeter()
    st = mine.init()
    r = np.random.RandomState(1)
    pred = r.randint(0, 7, (2, 24, 24))
    gt = r.randint(0, 7, (2, 24, 24)).astype(np.int64)
    gt[1, 5:9] = 255
    ref.update(torch.tensor(pred), torch.tensor(gt))
    st = mine.update(st, pred, gt)
    np.testing.assert_allclose(ref.get_score(verbose=False)["mIoU"],
                               mine.compute(st)["mIoU"], rtol=1e-9)


def test_normals_meter_parity():
    import torch
    ref_mod = _ref_eval("eval_normals")
    ref = ref_mod.NormalsMeter()
    mine = M.NormalsMeter()
    st = mine.init()
    r = np.random.RandomState(2)
    # gt: unit normals NCHW with an ignore patch
    g = r.randn(2, 3, 16, 16).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True) + 1e-12
    g[:, :, :3, :2] = 255.0
    # pred in meter-input space [B,H,W,3] 0..255
    p = r.rand(2, 16, 16, 3).astype(np.float32) * 255.0
    ref.update(torch.tensor(p), torch.tensor(g))
    st = mine.update(st, p, g.transpose(0, 2, 3, 1))
    a = ref.get_score(verbose=False)
    b = mine.compute(st)
    np.testing.assert_allclose(a["mean"], b["mean"], rtol=1e-4)
    np.testing.assert_allclose(a["rmse"], b["rmse"], rtol=1e-4)
    np.testing.assert_allclose(a["mean_v2"], b["mean_v2"], rtol=1e-4)


def test_saliency_meter_parity():
    import torch
    ref_mod = _ref_eval("eval_sal")
    ref = ref_mod.SaliencyMeter()
    mine = M.SaliencyMeter()
    st = mine.init()
    r = np.random.RandomState(3)
    for _ in range(2):
        p = r.rand(2, 16, 16).astype(np.float32) * 255.0
        g = (r.rand(2, 16, 16) > 0.6).astype(np.float32)
        ref.update(torch.tensor(p), torch.tensor(g))
        st = mine.update(st, p, g)
    a = ref.get_score(verbose=False)
    b = mine.compute(st)
    np.testing.assert_allclose(a["Beta maxF"], b["Beta maxF"], rtol=1e-5)
    np.testing.assert_allclose(a["maxF"], b["maxF"], rtol=1e-5)
    np.testing.assert_allclose(a["mIoU"], b["mIoU"], rtol=1e-5)


def test_depth_meter_parity():
    import torch
    ref_mod = _ref_eval("eval_depth")
    ref = ref_mod.DepthMeter()
    mine = M.DepthMeter()
    st = mine.init()
    r = np.random.RandomState(4)
    p = (r.rand(2, 16, 16).astype(np.float32) * 5.0)
    g = (r.rand(2, 16, 16).astype(np.float32) * 5.0 + 0.1)
    g[0, :5] = 255.0
    ref.update(torch.tensor(p), torch.tensor(g))
    st = mine.update(st, p, g)
    a = ref.get_score(verbose=False)
    b = mine.compute(st)
    np.testing.assert_allclose(a["rmse"], b["rmse"], rtol=1e-5)
    np.testing.assert_allclose(a["log_rmse"], b["log_rmse"], rtol=1e-5)


def test_edge_meter_parity():
    import torch
    ref_mod = _ref_eval("eval_edge")
    ref = ref_mod.EdgeMeter(pos_weight=0.95)
    mine = M.EdgeMeter(pos_weight=0.95)
    st = mine.init()
    r = np.random.RandomState(5)
    p = r.rand(2, 16, 16).astype(np.float32) * 255.0
    g = (r.rand(2, 16, 16) > 0.9).astype(np.float32)
    ref.update(torch.tensor(p), torch.tensor(g))
    st = mine.update(st, p, g)
    np.testing.assert_allclose(ref.get_score(verbose=False)["loss"],
                               mine.compute(st)["loss"], rtol=1e-4)


def test_get_output_shapes():
    r = np.random.RandomState(6)
    x = r.randn(2, 8, 8, 21).astype(np.float32)
    assert M.get_output(x, "semseg").shape == (2, 8, 8)
    x3 = r.randn(2, 8, 8, 3).astype(np.float32)
    n = np.asarray(M.get_output(x3, "normals"))
    assert n.shape == (2, 8, 8, 3) and n.min() >= 0 and n.max() <= 255
    x1 = r.randn(2, 8, 8, 1).astype(np.float32)
    s = np.asarray(M.get_output(x1, "sal"))
    assert s.shape == (2, 8, 8) and s.min() >= 0 and s.max() <= 255


def test_meter_states_reduce_across_shards():
    """Meter states are sums -> tree-add across shards == single update."""
    mine = M.SemsegMeter("PASCALContext")
    r = np.random.RandomState(7)
    pred = r.randint(0, 21, (4, 8, 8))
    gt = r.randint(0, 21, (4, 8, 8))
    whole = mine.update(mine.init(), pred, gt)
    s1 = mine.update(mine.init(), pred[:2], gt[:2])
    s2 = mine.update(mine.init(), pred[2:], gt[2:])
    summed = jax.tree.map(lambda a, b: a + b, s1, s2)
    np.testing.assert_allclose(mine.compute(whole)["mIoU"],
                               mine.compute(summed)["mIoU"], rtol=1e-12)


def test_meter_row_weight_padding_is_exact():
    """A 0-weight padded row (255-filled targets + _valid mask, the
    pad_last loader contract) must contribute EXACTLY nothing to every
    meter — including the no-mask saliency per-image jaccard and the
    edge meter's pixel-count denominator."""
    import jax.numpy as jnp

    tasks = ["semseg", "normals", "sal", "human_parts", "edge", "depth"]
    rs = np.random.RandomState(0)
    B, H, W = 5, 16, 16
    preds = {
        "semseg": jnp.asarray(rs.randn(B, H, W, 21), jnp.float32),
        "human_parts": jnp.asarray(rs.randn(B, H, W, 7), jnp.float32),
        "normals": jnp.asarray(rs.randn(B, H, W, 3), jnp.float32),
        "sal": jnp.asarray(rs.randn(B, H, W, 1), jnp.float32),
        "edge": jnp.asarray(rs.randn(B, H, W, 1), jnp.float32),
        "depth": jnp.asarray(rs.randn(B, H, W, 1) * 2 + 3, jnp.float32),
    }
    targets = {
        "semseg": jnp.asarray(rs.randint(0, 21, (B, H, W)), jnp.int32),
        "human_parts": jnp.asarray(rs.randint(0, 7, (B, H, W)),
                                   jnp.int32),
        "normals": jnp.asarray(rs.randn(B, H, W, 3), jnp.float32),
        "sal": jnp.asarray(rs.randint(0, 2, (B, H, W)), jnp.float32),
        "edge": jnp.asarray(rs.randint(0, 2, (B, H, W)), jnp.float32),
        "depth": jnp.asarray(rs.rand(B, H, W) * 5, jnp.float32),
    }
    exact = M.PerformanceMeter(tasks)
    exact.states = exact.update_jit(
        exact.states, {t: v[:3] for t, v in preds.items()},
        {t: v[:3] for t, v in targets.items()})
    s_exact = exact.get_score(verbose=False)

    tgt_pad = {t: jnp.concatenate([v[:3], jnp.full_like(v[3:], 255)])
               for t, v in targets.items()}
    w = jnp.asarray([1, 1, 1, 0, 0], jnp.float32)
    padded = M.PerformanceMeter(tasks)
    padded.states = padded.update_jit(padded.states, preds, tgt_pad, w)
    s_pad = padded.get_score(verbose=False)
    for t in tasks:
        for k, a in s_exact[t].items():
            np.testing.assert_allclose(a, s_pad[t][k], rtol=1e-6,
                                       err_msg=f"{t}/{k}")


def test_balanced_bce_row_weight_matches_subset():
    """balanced_bce_logits(row_weight): 0-weight rows excluded from
    every sum INCLUDING the size_average denominator."""
    import jax.numpy as jnp

    from mtlora_tpu.train.losses import balanced_bce_logits

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(4, 8, 8), jnp.float32)
    y = jnp.asarray(rs.randint(0, 2, (4, 8, 8)), jnp.float32)
    w = jnp.asarray([1, 1, 0, 0], jnp.float32)
    for pw in (None, 0.95):
        a = balanced_bce_logits(x[:2], y[:2], pos_weight=pw)
        b = balanced_bce_logits(x, y, pos_weight=pw, row_weight=w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)
