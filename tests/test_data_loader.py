"""Loader + offline-eval + native-transform integration tests."""

import numpy as np

from mtlora_tpu.data.loader import DataLoader, collate
from mtlora_tpu.data.synthetic import SyntheticMTL
from mtlora_tpu.data.thin import thin
from mtlora_tpu.evaluation.offline import (
    evaluate_saved_predictions,
    pascal_color_map,
    save_imgs_mtl,
    save_predictions,
)

TASKS = ["semseg", "normals", "sal", "human_parts"]


def test_loader_batching_and_drop_last():
    ds = SyntheticMTL(TASKS, img_size=32, length=10)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                    num_workers=2, seed=0)
    assert len(dl) == 2
    batches = list(dl.iter_epoch(0))
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 3)
        assert len(b["meta"]) == 4
    # no drop_last keeps the remainder
    dl2 = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                     num_workers=1)
    sizes = [b["image"].shape[0] for b in dl2.iter_epoch(0)]
    assert sorted(sizes) == [2, 4, 4]


def test_loader_shuffle_differs_by_epoch_but_deterministic():
    ds = SyntheticMTL(TASKS, img_size=32, length=16)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    e0 = dl.epoch_indices(0)
    e1 = dl.epoch_indices(1)
    assert not np.array_equal(e0, e1)
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    np.testing.assert_array_equal(e0, dl2.epoch_indices(0))


def test_collate_stacks_and_keeps_meta():
    ds = SyntheticMTL(TASKS, img_size=16, length=3)
    batch = collate([ds[0], ds[1]])
    assert batch["image"].shape[0] == 2
    assert isinstance(batch["meta"], list) and len(batch["meta"]) == 2


def test_offline_save_eval_roundtrip(tmp_path):
    r = np.random.RandomState(0)
    # perfect predictions -> perfect scores
    samples = []
    for i in range(3):
        sem = r.randint(0, 21, (16, 16)).astype(np.float32)
        samples.append({"semseg": sem,
                        "meta": {"image": f"img_{i}", "im_size": (16, 16)}})
        save_predictions(str(tmp_path), "semseg", [f"img_{i}"], sem[None])
    scores = evaluate_saved_predictions(str(tmp_path), "semseg", samples)
    assert scores["mIoU"] > 0.99


def test_save_imgs_mtl_writes_pngs(tmp_path):
    r = np.random.RandomState(1)
    imgs = r.rand(1, 16, 16, 3).astype(np.float32)
    labels = {"semseg": r.randint(0, 21, (1, 16, 16, 1)).astype(np.float32),
              "normals": r.randn(1, 16, 16, 3).astype(np.float32)}
    preds = {"semseg": r.randn(1, 16, 16, 21).astype(np.float32),
             "normals": r.randn(1, 16, 16, 3).astype(np.float32)}
    save_imgs_mtl(imgs, labels, preds, str(tmp_path), 0)
    import os

    files = set(os.listdir(tmp_path))
    assert {"0_img.png", "0_semseg_gt.png", "0_semseg_pred.png",
            "0_normals_gt.png", "0_normals_pred.png"} <= files


def test_pascal_color_map():
    cm = pascal_color_map()
    assert cm.shape == (256, 3)
    np.testing.assert_array_equal(cm[0], [0, 0, 0])
    np.testing.assert_array_equal(cm[1], [128, 0, 0])  # aeroplane


def test_thinning_produces_thin_lines():
    img = np.zeros((20, 20), bool)
    img[8:12, 2:18] = True  # 4-px-thick bar
    out = thin(img)
    assert out.sum() < img.sum()
    # thinned rows: at most 2 pixels thick anywhere
    assert out[:, 10].sum() <= 2
    # endpoints preserved-ish: still a connected-ish line
    assert out.sum() >= 10
