"""Loss parity vs the reference torch losses on synthetic tensors
(golden-value strategy from SURVEY.md section 4: the ignore-255 semantics
are easy to get wrong)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from ref_loader import reference_available  # noqa: E402

from mtlora_tpu.train import losses as L  # noqa: E402

pytestmark = pytest.mark.quick  # always-run gate tier


def _rand(shape, seed, lo=-3, hi=3):
    return np.random.RandomState(seed).uniform(lo, hi, shape).astype(
        np.float32)


def _load_ref_losses():
    sys.path.insert(0, "/root/reference")
    import importlib
    return importlib.import_module("mtl_loss_schemes")


@pytest.mark.skipif(not reference_available(), reason="no reference")
class TestLossParity:
    def test_semseg_ce_ignore(self):
        import torch
        ref = _load_ref_losses()
        logits = _rand((2, 21, 16, 16), 0)
        label = np.random.RandomState(1).randint(
            0, 22, (2, 1, 16, 16)).astype(np.float32)
        label[label == 21] = 255  # some ignored pixels
        ref_val = ref.SoftMaxwithLoss()(torch.tensor(logits),
                                        torch.tensor(label)).item()
        # NHWC for ours
        mine = float(L.softmax_ce_ignore(
            logits.transpose(0, 2, 3, 1), label.transpose(0, 2, 3, 1)))
        assert abs(ref_val - mine) < 1e-5

    def test_balanced_bce_sal(self):
        import torch
        ref = _load_ref_losses()
        logits = _rand((2, 1, 16, 16), 2)
        label = (np.random.RandomState(3).rand(2, 1, 16, 16) > 0.7
                 ).astype(np.float32)
        ref_val = ref.BalancedCrossEntropyLoss(size_average=True)(
            torch.tensor(logits), torch.tensor(label)).item()
        mine = float(L.balanced_bce_logits(
            logits.transpose(0, 2, 3, 1), label.transpose(0, 2, 3, 1)))
        assert abs(ref_val - mine) < 1e-5

    def test_balanced_bce_edge_posweight(self):
        import torch
        ref = _load_ref_losses()
        logits = _rand((2, 1, 8, 8), 4)
        label = (np.random.RandomState(5).rand(2, 1, 8, 8) > 0.9
                 ).astype(np.float32)
        ref_val = ref.BalancedCrossEntropyLoss(
            size_average=True, pos_weight=0.95)(
            torch.tensor(logits), torch.tensor(label)).item()
        mine = float(L.balanced_bce_logits(
            logits.transpose(0, 2, 3, 1), label.transpose(0, 2, 3, 1),
            pos_weight=0.95))
        assert abs(ref_val - mine) < 1e-5

    def test_normals(self):
        import torch
        ref = _load_ref_losses()
        pred = _rand((2, 3, 8, 8), 6)
        label = _rand((2, 3, 8, 8), 7, -1, 1)
        # ignore a patch
        label[:, :, :2, :3] = 255.0
        ref_val = ref.NormalsLoss(normalize=True, size_average=True, norm=1)(
            torch.tensor(pred), torch.tensor(label)).item()
        mine = float(L.normals_loss(
            pred.transpose(0, 2, 3, 1), label.transpose(0, 2, 3, 1)))
        assert abs(ref_val - mine) < 1e-5

    def test_depth(self):
        import torch
        ref = _load_ref_losses()
        pred = _rand((2, 1, 8, 8), 8, 0, 5)
        label = _rand((2, 1, 8, 8), 9, 0, 5)
        label[:, :, 4:, :] = 255.0
        ref_val = ref.DepthLoss("l1")(torch.tensor(pred),
                                      torch.tensor(label)).item()
        mine = float(L.depth_loss(
            pred.transpose(0, 2, 3, 1), label.transpose(0, 2, 3, 1)))
        assert abs(ref_val - mine) < 1e-5

    def test_multi_task_weighting(self):
        preds = {"semseg": _rand((1, 8, 8, 21), 10),
                 "sal": _rand((1, 8, 8, 1), 11)}
        tgts = {"semseg": np.random.RandomState(12).randint(
            0, 21, (1, 8, 8, 1)).astype(np.float32),
            "sal": (np.random.RandomState(13).rand(1, 8, 8, 1) > 0.5
                    ).astype(np.float32)}
        total, per = L.multi_task_loss(preds, tgts, ["semseg", "sal"])
        expect = 1.0 * per["semseg"] + 5.0 * per["sal"]
        np.testing.assert_allclose(float(total), float(expect), rtol=1e-6)
