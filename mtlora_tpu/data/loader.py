"""Batching + prefetching host->device data feeding.

Replaces the reference's torch DataLoader usage (data/mtl_ds.py:875-914)
with a framework-free loader: samples come from the numpy datasets +
transform pipeline, are collated into NHWC numpy batches, prefetched by
background worker threads, and (optionally) device_put onto the mesh with
the batch axis sharded — overlapping host augmentation with device
compute. The heavy per-pixel augmentation work can be offloaded to the
native C++ image ops (``mtlora_tpu/data/native``) when built.

Notably the reference's MTL path uses a plain shuffling DataLoader with
NO DistributedSampler (SURVEY.md section 2.2); here sharding is explicit:
pass ``process_index``/``process_count`` and every process draws the SAME
deterministic (seed, epoch)-keyed permutation, then takes its contiguous
per-batch slice — the global batch across processes is exactly the
single-process batch, and ``parallel.distributed.global_batch_from_local``
reassembles it on the device mesh. Multi-process loading drops the final
ragged global batch (shapes must match across processes for SPMD).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(samples: Sequence[Dict]) -> Dict:
    """Stack dict-of-array samples into a batch (reference collate_mil
    without the torch types; meta kept as a list)."""
    out: Dict = {}
    for key in samples[0]:
        if "meta" in key:
            out[key] = [s[key] for s in samples]
        else:
            out[key] = np.stack([s[key] for s in samples])
    return out


def ignore_fill_sample(sample: Dict) -> Dict:
    """Pad-row fill: every target gets the 255 ignore sentinel (all
    meters/losses mask 255; the residual no-mask accumulators are
    excluded via the "_valid" row weight the loader attaches)."""
    for k, v in sample.items():
        if k != "image" and "meta" not in k:
            sample[k] = np.full_like(v, 255)
    return sample


class DataLoader:
    """Shuffling, dropping-last, thread-prefetching batch loader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 2,
                 seed: int = 0, prefetch: int = 4,
                 process_fn: Optional[Callable] = None,
                 process_index: int = 0, process_count: int = 1,
                 pad_last: bool = False,
                 pad_fill: Optional[Callable] = None):
        """``batch_size`` is the GLOBAL batch; with ``process_count`` > 1
        each process loads its ``batch_size / process_count`` rows of
        every global batch (row block ``process_index``).

        ``pad_last`` (requires ``drop_last=False``): pad the ragged
        final global batch to full size instead of shrinking (single
        process; avoids a jit recompile) or dropping it (multi-process;
        the old sample-dropping behavior). Pad rows repeat sample 0
        passed through ``pad_fill`` (which should overwrite targets with
        their ignore sentinels) and every batch gains a ``"_valid"``
        float32 [local_bs] row-validity mask — the eval path threads it
        through meters and losses so padding contributes exactly
        nothing (reference validate consumes every sample,
        main.py:462-476).
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.seed = seed
        self.process_fn = process_fn
        self.process_index = process_index
        self.process_count = process_count
        assert not (pad_last and drop_last)
        self.pad_last = pad_last
        self.pad_fill = pad_fill
        if process_count > 1:
            assert batch_size % process_count == 0, (
                f"global batch {batch_size} must divide across "
                f"{process_count} processes")
        self.local_batch_size = batch_size // process_count

    def __len__(self):
        n = len(self.dataset)
        if self.pad_last:
            return -(-n // self.batch_size)
        if self.drop_last or self.process_count > 1:
            # multi-process without padding: every process must run the
            # same number of SPMD steps -> ragged final batch dropped
            return n // self.batch_size
        return -(-n // self.batch_size)

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """This process's sample indices for ``epoch``.

        The permutation is a pure function of (seed, epoch) — identical
        on every process and on every call, so resume-at-epoch-N replays
        the exact original stream (the reference reseeds torch globally,
        main.py:570-575; a mutable-RNG draw here would make the shuffle
        depend on call order)."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(
                np.array([self.seed, epoch], np.uint32)).shuffle(idx)
        if self.pad_last:
            # pad the ragged tail to a full global batch with -1 markers
            # (materialized as ignore-filled pad samples in iter_epoch)
            total = len(self) * self.batch_size
            idx = np.concatenate(
                [idx, np.full(total - len(idx), -1, idx.dtype)])
        if self.process_count > 1:
            nb = len(self)
            lbs = self.local_batch_size
            idx = idx[: nb * self.batch_size]
            # row block `process_index` of every global batch, so shard r
            # of the reassembled global array holds the same rows as the
            # single-process batch
            idx = idx.reshape(nb, self.process_count, lbs)
            return idx[:, self.process_index, :].reshape(-1)
        if self.drop_last:
            idx = idx[: len(self) * self.batch_size]
        return idx

    def __iter__(self) -> Iterator[Dict]:
        return self.iter_epoch(0)

    def iter_epoch(self, epoch: int) -> Iterator[Dict]:
        if hasattr(self.dataset, "set_epoch"):
            # (seed, epoch, index)-pure augmentation streams: exact
            # resume replay + identical global batches under any
            # process layout + thread-safe prefetch workers
            self.dataset.set_epoch(epoch, self.seed)
        idx = self.epoch_indices(epoch)
        bs = self.local_batch_size
        batches = [idx[i:i + bs] for i in range(0, len(idx), bs)]
        if self.drop_last or self.process_count > 1:
            batches = [b for b in batches if len(b) == bs]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batch_iter = iter(enumerate(batches))
        lock = threading.Lock()
        n_workers = self.num_workers
        done = object()
        # in-order yield bound: a worker never STARTS a batch more than
        # prefetch + n_workers positions ahead of the consumer, so the
        # `pending` reorder buffer (and host memory) stays bounded even
        # when one batch is slow
        cond = threading.Condition()
        progress = {"next": 0}
        max_ahead = self.prefetch + n_workers

        def make_pad(template: Dict) -> Dict:
            """Pad row built from an already-fetched sample: zero image
            (its content is masked by the "_valid" row weight anyway)
            plus ignore-filled targets — no extra dataset/transform
            invocation (and no augmentation-RNG draw) just for padding."""
            pad = {}
            for k, v in template.items():
                if "meta" in k:
                    pad[k] = v
                elif k == "image":
                    pad[k] = np.zeros_like(v)
                else:
                    pad[k] = np.array(v, copy=True)
            if self.pad_fill is not None:
                pad = self.pad_fill(pad)
            return pad

        def fetch(b) -> Dict:
            samples: List = [self.dataset[int(i)] if i >= 0 else None
                             for i in b]
            if any(s is None for s in samples):
                template = next((s for s in samples if s is not None),
                                None)
                if template is None:  # all-pad batch (tiny datasets)
                    template = self.dataset[0]
                pad = make_pad(template)
                samples = [pad if s is None else s for s in samples]
            batch = collate(samples)
            if self.pad_last:
                batch["_valid"] = (np.asarray(b) >= 0).astype(np.float32)
            if self.process_fn is not None:
                batch = self.process_fn(batch)
            return batch

        def worker():
            while True:
                with lock:
                    pos_b = next(batch_iter, None)
                if pos_b is None:
                    q.put(done)
                    return
                pos, b = pos_b
                with cond:
                    # timeout guards an abandoned generator (consumer
                    # stopped iterating -> no more notify); daemon
                    # threads then re-check and keep waiting harmlessly
                    while pos - progress["next"] >= max_ahead:
                        cond.wait(1.0)
                q.put((pos, fetch(b)))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(n_workers)]
        for t in threads:
            t.start()
        # yield strictly in submission order: worker threads finish out
        # of order, and under multi-process SPMD every process MUST emit
        # global batch k at step k or the reassembled global batches mix
        # rows across steps
        finished = 0
        next_pos = 0
        pending: Dict[int, Dict] = {}
        while finished < n_workers and next_pos < len(batches):
            item = q.get()
            if item is done:
                finished += 1
                continue
            pos, batch = item
            pending[pos] = batch
            while next_pos in pending:
                yield pending.pop(next_pos)
                next_pos += 1
                with cond:
                    progress["next"] = next_pos
                    cond.notify_all()
        while next_pos in pending:  # defensive drain (should be empty)
            yield pending.pop(next_pos)
            next_pos += 1


def build_loader(config):
    """Dataset/loader dispatch (reference data/build.py + data/__init__.py):
    returns (ds_train, ds_val, loader_train, loader_val, mixup_fn=None)."""
    from mtlora_tpu.data.transforms import get_transformations

    db = config.DATA.DBNAME
    tasks = list(config.TASKS)
    tasks_cfg = config.TASKS_CONFIG
    tr_train, tr_val = get_transformations(db, tasks_cfg)
    kwargs_common = dict(root=config.DATA.DATA_PATH)
    if db == "PASCALContext":
        from mtlora_tpu.data.pascal import PASCALContext as DS

        flags = dict(do_edge="edge" in tasks, do_semseg="semseg" in tasks,
                     do_normals="normals" in tasks, do_sal="sal" in tasks,
                     do_human_parts="human_parts" in tasks)
    elif db == "NYUD":
        from mtlora_tpu.data.nyud import NYUD_MT as DS

        flags = dict(do_edge="edge" in tasks, do_semseg="semseg" in tasks,
                     do_normals="normals" in tasks,
                     do_depth="depth" in tasks)
    else:
        raise NotImplementedError(db)
    ds_train = DS(split="train", transform=tr_train, **flags,
                  **kwargs_common)
    ds_val = DS(split="val", transform=tr_val, **flags, **kwargs_common)
    import jax

    rank, world = jax.process_index(), jax.process_count()
    loader_train = DataLoader(ds_train, config.DATA.BATCH_SIZE,
                              shuffle=True, drop_last=True,
                              num_workers=config.DATA.NUM_WORKERS,
                              seed=config.SEED,
                              process_index=rank, process_count=world)
    loader_val = DataLoader(ds_val, config.DATA.BATCH_SIZE, shuffle=False,
                            drop_last=False,
                            num_workers=config.DATA.NUM_WORKERS,
                            process_index=rank, process_count=world,
                            pad_last=True, pad_fill=ignore_fill_sample)
    return ds_train, ds_val, loader_train, loader_val, None
