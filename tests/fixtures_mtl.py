"""On-disk dataset fixtures in the exact PASCAL_MT / NYUD_MT formats.

Builds tiny synthetic dataset trees that byte-for-byte match the layouts
the reference loaders consume (reference data/mtl_ds.py:245-645 for
PASCAL_MT, :53-243 for NYUD_MT): JPEG images, PNG label maps, MATLAB
``LabelMap`` context mats and nested ``anno`` human-parts structs
(scipy.io round-trip verified against the reference's positional access
pattern ``mat['anno'][0][0][1][0][obj][field]``), distilled normals/sal
PNGs, and the split text files. The builders return deterministic
ground-truth side info so tests can assert the loaders' label semantics
(parts merge, normals class masking, sal binarization, semseg shift)
against independently computed expectations.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np
import scipy.io as sio
from PIL import Image

from mtlora_tpu.data.pascal import (HUMAN_PART_6, HUMAN_PARTS_CATEGORY,
                                    NORMALS_VALID_CLASSES)

# a few context classes with valid distilled normals and a few without
# (NORMALS_VALID_CLASSES holds the valid ids; 0/1/2 are invalid)
_VALID_CLS = [3, 4, 9, 59]
_INVALID_CLS = [0, 1, 2, 5]


def _rs(seed) -> np.random.RandomState:
    return np.random.RandomState(np.array(seed, np.uint32))


def _save_png(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _save_jpg(path: str, hw: Tuple[int, int], seed) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = _rs(seed).randint(0, 255, (*hw, 3), dtype=np.uint8)
    Image.fromarray(img).save(path, quality=90)


def _label_map(hw: Tuple[int, int], seed) -> np.ndarray:
    """Blocky uint16 context label map mixing normals-valid and
    normals-invalid class ids (8x8 tiles so the Laplacian edge map has
    real boundaries to thin)."""
    rs = _rs(seed)
    th, tw = -(-hw[0] // 8), -(-hw[1] // 8)
    tiles = rs.choice(_VALID_CLS + _INVALID_CLS, size=(th, tw))
    lab = np.kron(tiles, np.ones((8, 8), np.int64))[: hw[0], : hw[1]]
    return lab.astype(np.uint16)


def _parts_struct(parts: Sequence[Tuple[str, np.ndarray]]) -> np.ndarray:
    """(1, n) struct array of (part_name, mask); empty -> len()==0
    sentinel exactly as loadmat returns a saved empty array."""
    if not parts:
        return np.zeros((0, 0))
    arr = np.zeros((1, len(parts)),
                   dtype=[("part_name", "O"), ("mask", "O")])
    for j, (name, mask) in enumerate(parts):
        arr[0, j] = (name, mask.astype(np.uint8))
    return arr


def save_parts_mat(path: str, objs: Sequence[Tuple[int, np.ndarray,
                                                   Sequence]]) -> None:
    """Write a human_parts ``anno`` mat. ``objs`` is a list of
    (category_id, instance_mask, [(part_name, part_mask), ...]).

    Field order matters: the loaders index positionally —
    [1]=class_ind, [2]=mask, [3]=parts (mtl_ds.py:526-549)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rec = np.zeros((1, len(objs)),
                   dtype=[("class", "O"), ("class_ind", "O"),
                          ("mask", "O"), ("parts", "O")])
    for j, (cat, mask, parts) in enumerate(objs):
        rec[0, j] = ("obj%d" % j, np.array([[cat]], np.uint8),
                     mask.astype(np.uint8), _parts_struct(parts))
    anno = np.zeros((1, 1), dtype=[("imname", "O"), ("objects", "O")])
    anno[0, 0] = (os.path.basename(path)[:-4], rec)
    sio.savemat(path, {"anno": anno})


def _rect(hw, r0, r1, c0, c1) -> np.ndarray:
    m = np.zeros(hw, np.uint8)
    m[r0:r1, c0:c1] = 1
    return m


def make_pascal_fixture(root: str) -> Dict:
    """Six-image PASCAL_MT tree. Returns expectation side info:
    {ids, hw, expected_parts (merged target per id or None),
     label_maps, sal_raw, normals_raw, semseg_maps, cats_per_id}."""
    ids = ["2008_%06d" % i for i in range(6)]
    info: Dict = {"ids": ids, "hw": {}, "expected_parts": {},
                  "label_maps": {}, "sal_raw": {}, "normals_raw": {},
                  "semseg_maps": {}, "cats": {}}
    for i, im_id in enumerate(ids):
        hw = (72, 56) if i == 1 else (64, 80)
        info["hw"][im_id] = hw
        _save_jpg(os.path.join(root, "JPEGImages", im_id + ".jpg"),
                  hw, (1, i))

        # context LabelMap (edge + normals-mask source). Image 2's
        # ancillary maps are ALL written at half size (mutually
        # consistent — the loader masks normals with the LabelMap at
        # native size) to exercise the loaders' resize-to-image branch.
        map_hw = (hw[0] // 2, hw[1] // 2) if i == 2 else hw
        lab = _label_map(map_hw, (2, i))
        info["label_maps"][im_id] = lab
        os.makedirs(os.path.join(root, "pascal-context", "trainval"),
                    exist_ok=True)
        sio.savemat(os.path.join(root, "pascal-context", "trainval",
                                 im_id + ".mat"), {"LabelMap": lab})

        # human parts anno structs — per-image scenarios:
        #   0: person with 2 parts + chair without parts
        #   1: person WITHOUT parts + cow  (has_human_parts yet zeros)
        #   2: no person at all
        #   3: tiny-area person with parts (area_thres tests)
        #   4: two persons with overlapping parts (second wins write order)
        #   5: person with every merged-part group
        person = HUMAN_PARTS_CATEGORY
        if i == 0:
            objs = [(person, _rect(hw, 8, 40, 8, 40),
                     [("head", _rect(hw, 8, 16, 8, 40)),
                      ("torso", _rect(hw, 16, 40, 8, 40))]),
                    (9, _rect(hw, 40, 56, 40, 56), [])]
        elif i == 1:
            objs = [(person, _rect(hw, 0, 16, 0, 16), []),
                    (10, _rect(hw, 20, 40, 20, 40), [])]
        elif i == 2:
            objs = [(9, _rect(hw, 0, 32, 0, 32), [])]
        elif i == 3:
            objs = [(person, _rect(hw, 0, 2, 0, 2),
                     [("head", _rect(hw, 0, 2, 0, 2))])]
        elif i == 4:
            objs = [(person, _rect(hw, 0, 32, 0, 32),
                     [("head", _rect(hw, 0, 16, 0, 32))]),
                    (person, _rect(hw, 8, 48, 0, 32),
                     [("torso", _rect(hw, 8, 24, 0, 32))])]
        else:
            objs = [(person, _rect(hw, 0, 64, 0, 56),
                     [("hair", _rect(hw, 0, 8, 0, 16)),
                      ("neck", _rect(hw, 8, 16, 0, 16)),
                      ("luarm", _rect(hw, 16, 24, 0, 16)),
                      ("rhand", _rect(hw, 24, 32, 0, 16)),
                      ("ruleg", _rect(hw, 32, 40, 0, 16)),
                      ("lfoot", _rect(hw, 40, 48, 0, 16))])]
        save_parts_mat(os.path.join(root, "human_parts", im_id + ".mat"),
                       objs)
        info["cats"][im_id] = [int(c) for c, _, _ in objs]
        # independently-computed merged parts target (write order = the
        # loader's object->part iteration order)
        exp = None
        for cat, mask, parts in objs:
            if cat == person and parts:
                if exp is None:
                    exp = np.zeros(hw, float)
                for name, pmask in parts:
                    exp[pmask.astype(bool)] = HUMAN_PART_6[name]
        info["expected_parts"][im_id] = exp

        nrm = _rs((3, i)).randint(0, 255, (*map_hw, 3), dtype=np.uint8)
        info["normals_raw"][im_id] = nrm
        _save_png(os.path.join(root, "normals_distill", im_id + ".png"),
                  nrm)

        sal = _rs((4, i)).randint(0, 255, map_hw, dtype=np.uint8)
        info["sal_raw"][im_id] = sal
        _save_png(os.path.join(root, "sal_distill", im_id + ".png"), sal)

        # semseg: alternate between the VOC12 and pascal-context dirs to
        # exercise both filename branches (mtl_ds.py:592-603)
        sem = _rs((5, i)).randint(0, 21, map_hw, dtype=np.uint8)
        sem[sem == 20] = 255  # some ignore pixels
        info["semseg_maps"][im_id] = sem
        sub = "VOC12" if i % 2 == 0 else "pascal-context"
        _save_png(os.path.join(root, "semseg", sub, im_id + ".png"), sem)

    os.makedirs(os.path.join(root, "ImageSets", "Context"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "Context",
                           "train.txt"), "w") as f:
        f.write("\n".join(ids[:4]) + "\n")
    with open(os.path.join(root, "ImageSets", "Context",
                           "val.txt"), "w") as f:
        f.write("\n".join(ids[4:]) + "\n")
    return info


def make_nyud_fixture(root: str) -> Dict:
    """Four-image NYUD_MT tree (images/, edge/, segmentation/, normals/,
    depth/, gt_sets/). Returns {ids, hw, semseg_maps, depth, normals,
    edge}."""
    ids = ["%06d" % (i + 1) for i in range(4)]
    info: Dict = {"ids": ids, "hw": {}, "semseg_maps": {}, "depth": {},
                  "normals": {}, "edge": {}}
    for i, im_id in enumerate(ids):
        hw = (64, 80)
        info["hw"][im_id] = hw
        _save_jpg(os.path.join(root, "images", im_id + ".jpg"), hw, (9, i))

        edge = (_rs((10, i)).rand(*hw) > 0.9).astype(np.float64)
        info["edge"][im_id] = edge
        os.makedirs(os.path.join(root, "edge"), exist_ok=True)
        np.save(os.path.join(root, "edge", im_id + ".npy"), edge)

        sem = _rs((11, i)).randint(0, 41, hw, dtype=np.uint8)
        info["semseg_maps"][im_id] = sem
        _save_png(os.path.join(root, "segmentation", im_id + ".png"), sem)

        nrm = _rs((12, i)).randn(*hw, 3)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        info["normals"][im_id] = nrm
        os.makedirs(os.path.join(root, "normals"), exist_ok=True)
        np.save(os.path.join(root, "normals", im_id + ".npy"), nrm)

        dep = _rs((13, i)).rand(*hw) * 9.0 + 0.5
        info["depth"][im_id] = dep
        os.makedirs(os.path.join(root, "depth"), exist_ok=True)
        np.save(os.path.join(root, "depth", im_id + ".npy"), dep)

    os.makedirs(os.path.join(root, "gt_sets"), exist_ok=True)
    with open(os.path.join(root, "gt_sets", "train.txt"), "w") as f:
        f.write("\n".join(ids[:3]) + "\n")
    with open(os.path.join(root, "gt_sets", "val.txt"), "w") as f:
        f.write("\n".join(ids[3:]) + "\n")
    return info
