"""Host-side batching loader with threaded prefetch.

Replaces torch `DataLoader` for this framework: items are `(inputs, targets)`
dicts of numpy arrays; collation stacks leaves (padding the last axis of
audio to the batch max so jit shapes stay static per batch-size bucket).
Thread workers (not processes) are used — the dataset work is numpy/IO which
releases the GIL; TPU hosts have plenty of cores.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _collate_leaves(values):
    v0 = values[0]
    if isinstance(v0, np.ndarray) and v0.ndim >= 1:
        max_t = max(v.shape[-1] for v in values)
        if any(v.shape[-1] != max_t for v in values):
            values = [np.pad(v, [(0, 0)] * (v.ndim - 1)
                             + [(0, max_t - v.shape[-1])]) for v in values]
        return np.stack(values)
    return np.asarray(values)


def collate(items):
    inputs = {k: _collate_leaves([it[0][k] for it in items])
              for k in items[0][0]}
    targets = {k: _collate_leaves([it[1][k] for it in items])
               for k in items[0][1]}
    return inputs, targets


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=0,
                 worker_init_fn=None, drop_last=False, **_):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.worker_init_fn = worker_init_fn
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        if self.worker_init_fn is not None:
            self.worker_init_fn(0)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.num_workers <= 0:
            for idxs in batches:
                yield collate([self.dataset[int(i)] for i in idxs])
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # prefetch up to 2 batches ahead
            pending = []
            it = iter(batches)

            def submit(idxs):
                return [pool.submit(self.dataset.__getitem__, int(i))
                        for i in idxs]

            for idxs in it:
                pending.append(submit(idxs))
                if len(pending) >= 3:
                    yield collate([f.result() for f in pending.pop(0)])
            while pending:
                yield collate([f.result() for f in pending.pop(0)])
