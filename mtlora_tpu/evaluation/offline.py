"""Offline prediction saving + evaluation.

Rebuild of the reference's sample-visualization helper
(``utils.py:405-438`` save_imgs_mtl) and its offline eval scripts
(``evaluation/eval_semseg.py:151``, ``eval_human_parts.py:136``,
``eval_depth.py:111`` — which in the reference reference nonexistent
modules and have rotted; here they work): predictions are saved as PNG
(segmentation/saliency) or ``.npy`` (normals/depth) per image id, and
``evaluate_saved_predictions`` streams them back through the same jit
meters used online.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable

import numpy as np
from PIL import Image

from mtlora_tpu.evaluation.meters import get_output, get_single_task_meter


def pascal_color_map(N: int = 256, normalized: bool = False) -> np.ndarray:
    """PASCAL VOC class color palette (reference data/helpers.py:33-57)."""
    def bitget(v, i):
        return (v >> i) & 1

    cmap = np.zeros((N, 3), dtype=np.float32 if normalized else np.uint8)
    for i in range(N):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap / 255.0 if normalized else cmap


def _norm255(arr: np.ndarray) -> np.ndarray:
    lo, hi = float(arr.min()), float(arr.max())
    return (arr - lo) * 255.0 / max(hi - lo, 1e-10)


def save_predictions(output_dir: str, task: str, im_ids: Iterable[str],
                     preds: np.ndarray):
    """Save one batch of processed predictions (get_output space)."""
    task_dir = os.path.join(output_dir, task)
    os.makedirs(task_dir, exist_ok=True)
    preds = np.asarray(preds)
    for i, im_id in enumerate(im_ids):
        p = preds[i]
        if task in ("semseg", "human_parts"):
            Image.fromarray(p.astype(np.uint8)).save(
                os.path.join(task_dir, f"{im_id}.png"))
        elif task in ("sal", "edge"):
            Image.fromarray(p.astype(np.uint8)).save(
                os.path.join(task_dir, f"{im_id}.png"))
        else:  # normals / depth: float payloads
            np.save(os.path.join(task_dir, f"{im_id}.npy"), p)


def load_prediction(output_dir: str, task: str, im_id: str) -> np.ndarray:
    task_dir = os.path.join(output_dir, task)
    png = os.path.join(task_dir, f"{im_id}.png")
    if os.path.isfile(png):
        return np.asarray(Image.open(png)).astype(np.float32)
    return np.load(os.path.join(task_dir, f"{im_id}.npy"))


def evaluate_saved_predictions(output_dir: str, task: str, dataset,
                               database: str = "PASCALContext") -> Dict:
    """Stream saved predictions + dataset ground truth through a meter.

    ``dataset`` yields dict samples with the task key and meta.image id
    (the transform-free val dataset).
    """
    meter = get_single_task_meter(task, database)
    state = meter.init()
    for sample in dataset:
        im_id = sample["meta"]["image"]
        gt = np.asarray(sample[task], np.float32)
        if gt.ndim == 3 and gt.shape[-1] == 1:
            gt = gt[..., 0]
        pred = load_prediction(output_dir, task, im_id)
        state = meter.update(state, pred[None], gt[None])
    return meter.compute(state)


def save_imgs_mtl(batch_imgs, batch_labels, batch_predictions, path: str,
                  idx) -> None:
    """Save input/gt/pred visualization PNGs for one batch element
    (reference save_imgs_mtl, utils.py:405-438). NHWC numpy inputs."""
    os.makedirs(path, exist_ok=True)
    img = np.asarray(batch_imgs)[0]
    Image.fromarray(_norm255(img).astype(np.uint8)).save(
        f"{path}/{idx}_img.png")
    for task, label in batch_labels.items():
        lab = np.asarray(label)[0].squeeze()
        pred = np.asarray(get_output(batch_predictions[task], task))[0]
        pred = np.asarray(pred).squeeze()
        if task in ("semseg", "human_parts"):
            # overlay valid-region mask on the image like the reference
            base = _norm255(img).astype(np.uint8)
            overlay = base.copy()
            overlay[..., 2] = np.where(lab != 255, 255, overlay[..., 2])
            Image.fromarray(overlay).save(f"{path}/{idx}_{task}_gt.png")
            overlay = base.copy()
            overlay[..., 2] = np.where(pred != 225, 255, overlay[..., 2])
            Image.fromarray(overlay).save(f"{path}/{idx}_{task}_pred.png")
        else:
            Image.fromarray(_norm255(lab).astype(np.uint8)).save(
                f"{path}/{idx}_{task}_gt.png")
            Image.fromarray(_norm255(pred).astype(np.uint8)).save(
                f"{path}/{idx}_{task}_pred.png")
