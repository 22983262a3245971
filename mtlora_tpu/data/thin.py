"""Morphological thinning (skeletonization) for edge ground truth.

The reference thins the Laplacian of the PASCAL-Context label map with
``skimage.morphology.thin`` (data/mtl_ds.py:34,526). skimage is not in
this environment; this is a self-contained Zhang-Suen thinning with the
same contract (binary ndarray in, single-pixel-wide skeleton out).
"""

from __future__ import annotations

import numpy as np


def thin(image: np.ndarray, max_num_iter: int | None = None) -> np.ndarray:
    """Zhang-Suen thinning of a binary image."""
    img = (np.asarray(image) > 0).astype(np.uint8)
    img = np.pad(img, 1)
    changed = True
    it = 0
    while changed and (max_num_iter is None or it < max_num_iter):
        changed = False
        it += 1
        for phase in (0, 1):
            p2 = img[:-2, 1:-1]
            p3 = img[:-2, 2:]
            p4 = img[1:-1, 2:]
            p5 = img[2:, 2:]
            p6 = img[2:, 1:-1]
            p7 = img[2:, :-2]
            p8 = img[1:-1, :-2]
            p9 = img[:-2, :-2]
            center = img[1:-1, 1:-1]
            ring = [p2, p3, p4, p5, p6, p7, p8, p9]
            b = sum(ring)
            a = sum(((ring[i] == 0) & (ring[(i + 1) % 8] == 1)).astype(
                np.uint8) for i in range(8))
            if phase == 0:
                cond = ((center == 1) & (b >= 2) & (b <= 6) & (a == 1)
                        & (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0))
            else:
                cond = ((center == 1) & (b >= 2) & (b <= 6) & (a == 1)
                        & (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0))
            if cond.any():
                img[1:-1, 1:-1] = np.where(cond, 0, center)
                changed = True
    return img[1:-1, 1:-1].astype(bool)
