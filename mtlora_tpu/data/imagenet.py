"""Legacy ImageNet classification / SimMIM pretrain data path.

Rebuild of the reference's inherited-from-Swin data machinery
(``data/cached_image_folder.py``, ``data/zipreader.py``,
``data/samplers.py``, ``data/data_simmim_pt.py``,
``data/imagenet22k_dataset.py``) — reachable only for
``DATA.DATASET=imagenet*`` (data/build.py:64-108) and unused by the MTL
path. Provided framework-free: folder/zip ImageNet datasets, a
part-cache, the 22K json dataset, SimMIM random mask generation, mixup /
cutmix, and an interleaved sub-sampler.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from mtlora_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def _find_classes(root: str) -> List[str]:
    return sorted(d for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d)))


class ImageFolder:
    """<root>/<class>/<img> classification dataset (cached_image_folder
    equivalent; ann-file mode also supported via ``ann_file``)."""

    def __init__(self, root: str, transform=None,
                 ann_file: Optional[str] = None, img_size: int = 224):
        self.root = root
        self.transform = transform
        self.img_size = img_size
        self.samples: List[Tuple[str, int]] = []
        if ann_file and os.path.isfile(ann_file):
            with open(ann_file) as f:
                for line in f:
                    path, cls = line.strip().split("\t")
                    self.samples.append((os.path.join(root, path),
                                         int(cls)))
        else:
            for ci, cls in enumerate(_find_classes(root)):
                cdir = os.path.join(root, cls)
                for fn in sorted(os.listdir(cdir)):
                    if fn.lower().endswith(_EXTS):
                        self.samples.append((os.path.join(cdir, fn), ci))

    def __len__(self):
        return len(self.samples)

    def _load(self, path: str) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        return np.asarray(img).astype(np.float32)

    def __getitem__(self, index: int) -> Dict:
        path, target = self.samples[index]
        img = self._load(path)
        sample = {"image": img, "label": np.int32(target)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class ZipImageFolder(ImageFolder):
    """ImageNet-in-a-zip (zipreader equivalent): members named
    <class>/<img>; the zip handle is opened lazily per process."""

    def __init__(self, zip_path: str, transform=None, img_size: int = 224):
        self.zip_path = zip_path
        self.transform = transform
        self.img_size = img_size
        self._zf: Optional[zipfile.ZipFile] = None
        with zipfile.ZipFile(zip_path) as zf:
            names = [n for n in zf.namelist()
                     if n.lower().endswith(_EXTS)]
        classes = sorted({n.split("/")[0] for n in names})
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [(n, self.class_to_idx[n.split("/")[0]])
                        for n in sorted(names)]

    def _load(self, member: str) -> np.ndarray:
        if self._zf is None:
            self._zf = zipfile.ZipFile(self.zip_path)
        img = Image.open(io.BytesIO(self._zf.read(member))).convert("RGB")
        return np.asarray(img).astype(np.float32)


class IN22KDataset(ImageFolder):
    """ImageNet-22K via annotation json (imagenet22k_dataset equivalent)."""

    def __init__(self, root: str, ann_json: str, transform=None,
                 img_size: int = 224):
        self.root = root
        self.transform = transform
        self.img_size = img_size
        with open(ann_json) as f:
            entries = json.load(f)
        self.samples = [(os.path.join(root, e[0]), int(e[1]))
                        for e in entries]


class ClassificationTransform:
    """Resize->center-crop->normalize eval transform for the legacy path."""

    def __init__(self, img_size: int = 224, crop: bool = True):
        self.img_size = img_size
        self.crop = crop

    def __call__(self, sample: Dict) -> Dict:
        import cv2

        img = sample["image"]
        if self.crop:
            size = int(self.img_size / 0.875)
            h, w = img.shape[:2]
            scale = size / min(h, w)
            img = cv2.resize(img, (int(round(w * scale)),
                                   int(round(h * scale))),
                             interpolation=cv2.INTER_CUBIC)
            h, w = img.shape[:2]
            y0 = (h - self.img_size) // 2
            x0 = (w - self.img_size) // 2
            img = img[y0:y0 + self.img_size, x0:x0 + self.img_size]
        else:
            img = cv2.resize(img, (self.img_size, self.img_size),
                             interpolation=cv2.INTER_CUBIC)
        img = img.astype(np.uint8).astype(np.float32) / 255.0
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        sample["image"] = img.astype(np.float32)
        return sample


class SubsetInterleavedIndices:
    """Rank-interleaved eval subset (data/samplers.py equivalent):
    indices [rank::world] for distributed validation without padding."""

    def __init__(self, length: int, rank: int = 0, world: int = 1):
        self.indices = np.arange(rank, length, world)

    def __iter__(self):
        return iter(self.indices.tolist())

    def __len__(self):
        return len(self.indices)


class MaskGenerator:
    """SimMIM random patch mask (data_simmim_pt.py equivalent)."""

    def __init__(self, input_size: int = 192, mask_patch_size: int = 32,
                 model_patch_size: int = 4, mask_ratio: float = 0.6):
        assert input_size % mask_patch_size == 0
        assert mask_patch_size % model_patch_size == 0
        self.rand_size = input_size // mask_patch_size
        self.scale = mask_patch_size // model_patch_size
        self.token_count = self.rand_size ** 2
        self.mask_count = int(np.ceil(self.token_count * mask_ratio))

    def __call__(self, rng: Optional[np.random.RandomState] = None
                 ) -> np.ndarray:
        rng = rng or np.random
        mask_idx = rng.permutation(self.token_count)[: self.mask_count]
        mask = np.zeros(self.token_count, dtype=np.int32)
        mask[mask_idx] = 1
        mask = mask.reshape(self.rand_size, self.rand_size)
        return mask.repeat(self.scale, 0).repeat(self.scale, 1)


def mixup_cutmix(images: np.ndarray, labels: np.ndarray, num_classes: int,
                 mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                 switch_prob: float = 0.5, label_smoothing: float = 0.1,
                 rng: Optional[np.random.RandomState] = None):
    """Batch-mode mixup/cutmix with smoothed soft targets (the timm Mixup
    configuration at reference data/build.py:100-108)."""
    rng = rng or np.random
    B = images.shape[0]
    lam = 1.0
    perm = rng.permutation(B)
    use_cutmix = rng.rand() < switch_prob
    if use_cutmix and cutmix_alpha > 0:
        lam = float(rng.beta(cutmix_alpha, cutmix_alpha))
        H, W = images.shape[1:3]
        rh, rw = int(H * np.sqrt(1 - lam)), int(W * np.sqrt(1 - lam))
        cy, cx = rng.randint(H), rng.randint(W)
        y0, y1 = np.clip(cy - rh // 2, 0, H), np.clip(cy + rh // 2, 0, H)
        x0, x1 = np.clip(cx - rw // 2, 0, W), np.clip(cx + rw // 2, 0, W)
        images = images.copy()
        images[:, y0:y1, x0:x1] = images[perm][:, y0:y1, x0:x1]
        lam = 1.0 - (y1 - y0) * (x1 - x0) / (H * W)
    elif mixup_alpha > 0:
        lam = float(rng.beta(mixup_alpha, mixup_alpha))
        images = lam * images + (1 - lam) * images[perm]

    off = label_smoothing / num_classes
    on = 1.0 - label_smoothing + off
    y1h = np.full((B, num_classes), off, np.float32)
    y1h[np.arange(B), labels] = on
    y2h = y1h[perm]
    targets = lam * y1h + (1 - lam) * y2h
    return images.astype(np.float32), targets
