"""Synthetic multi-task dataset for benchmarks and smoke tests.

Shapes/dtypes/value ranges (incl. 255-ignore sentinels) match the real
pipelines so train/eval paths exercise identical code. The reference's
closest analogue is its overfit=64-images mode (data/mtl_ds.py:160-164).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from mtlora_tpu.data.task_config import get_tasks_config


class SyntheticMTL:
    def __init__(self, tasks: Sequence[str], img_size: int = 448,
                 length: int = 64, db_name: str = "PASCALContext",
                 seed: int = 0, transform=None):
        self.tasks = list(tasks)
        self.img_size = img_size
        self.length = length
        self.seed = seed
        self.transform = transform
        cfg, _ = get_tasks_config(db_name, self.tasks, img_size)
        self.num_output = cfg["NUM_OUTPUT"]

    def __len__(self):
        return self.length

    def __getitem__(self, index: int) -> Dict:
        r = np.random.RandomState(self.seed * 100003 + index)
        s = self.img_size
        sample: Dict = {
            "image": r.randint(0, 256, (s, s, 3)).astype(float)}
        for t in self.tasks:
            if t in ("semseg", "human_parts"):
                lab = r.randint(0, self.num_output[t], (s, s)).astype(float)
                lab[: s // 8] = 255.0
                sample[t] = lab
            elif t == "normals":
                n = r.randn(s, s, 3)
                n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
                sample[t] = n
            elif t in ("sal", "edge"):
                sample[t] = (r.rand(s, s) > 0.7).astype(float)
            elif t == "depth":
                d = r.rand(s, s) * 10.0 + 0.5
                d[: s // 8] = 255.0
                sample[t] = d
        sample["meta"] = {"image": f"synthetic_{index}",
                          "im_size": (s, s)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


def synthetic_batch(tasks: Sequence[str], batch_size: int = 8,
                    img_size: int = 448, seed: int = 0,
                    db_name: str = "PASCALContext") -> Dict:
    """One collated NHWC batch through the REAL transform pipeline."""
    from mtlora_tpu.data.loader import collate
    from mtlora_tpu.data.transforms import get_transformations

    cfg, _ = get_tasks_config(db_name, list(tasks), img_size)
    _, tr_val = get_transformations(db_name, cfg,
                                    rng=np.random.RandomState(seed))
    ds = SyntheticMTL(tasks, img_size, batch_size, db_name, seed,
                      transform=tr_val)
    batch = collate([ds[i] for i in range(batch_size)])
    batch.pop("meta", None)
    return batch
