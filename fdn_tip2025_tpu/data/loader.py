"""Host-side batching + device prefetch.

Replaces the reference's torch DataLoader + prefetchers
(basicsr/data/prefetch_dataloader.py, data/__init__.py:56-121): worker
threads decode/augment on the host, a bounded queue double-buffers batches,
and `prefetch_to_device` overlaps H2D transfer with compute (the TPU analog
of CUDAPrefetcher's side-stream copy).
"""

import itertools
import queue
import threading

import numpy as np

import jax


class BatchLoader:
    """Iterates (lq, gt) NHWC float32 batches from a map-style dataset."""

    def __init__(self, dataset, batch_size, sampler=None, shuffle=False,
                 num_workers=2, seed=0, drop_last=True, loop=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.loop = loop
        self.epoch = 0

    def _index_stream(self):
        for epoch in itertools.count():
            self.epoch = epoch
            if self.sampler is not None:
                self.sampler.set_epoch(epoch)
                idx = list(self.sampler.indices())
            elif self.shuffle:
                rng = np.random.default_rng(self.seed + epoch)
                idx = list(rng.permutation(len(self.dataset)))
            else:
                idx = list(range(len(self.dataset)))
            yield from idx
            if not self.loop:
                return

    def __iter__(self):
        stream = self._index_stream()
        rng_counter = itertools.count()
        work_q = queue.Queue(maxsize=self.num_workers * 2)
        out_q = queue.Queue(maxsize=4)
        stop = object()

        def producer():
            batch = []
            for i in stream:
                batch.append(i)
                if len(batch) == self.batch_size:
                    work_q.put(list(batch))
                    batch.clear()
            if batch and not self.drop_last:
                work_q.put(batch)
            work_q.put(stop)

        def worker():
            while True:
                item = work_q.get()
                if item is stop:
                    work_q.put(stop)  # propagate
                    out_q.put(stop)
                    return
                rng = np.random.default_rng(
                    self.seed * 1_000_003 + next(rng_counter))
                samples = [self.dataset.__getitem__(i, rng=rng)
                           for i in item]
                out_q.put({
                    "lq": np.stack([s["lq"] for s in samples]),
                    "gt": np.stack([s["gt"] for s in samples]),
                    "lq_path": [s["lq_path"] for s in samples],
                    "gt_path": [s["gt_path"] for s in samples],
                })

        threading.Thread(target=producer, daemon=True).start()
        workers = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for w in workers:
            w.start()
        done = 0
        while True:
            item = out_q.get()
            if item is stop:
                done += 1
                if done == self.num_workers:
                    return
                continue
            yield item


def prefetch_to_device(iterator, sharding=None, keys=("lq", "gt"), depth=2):
    """Double-buffer H2D: device_put the next `depth` batches eagerly."""
    buf = []
    it = iter(iterator)

    def put(batch):
        arrs = {k: (jax.device_put(batch[k], sharding) if sharding is not None
                    else jax.device_put(batch[k]))
                for k in keys if k in batch}
        rest = {k: v for k, v in batch.items() if k not in keys}
        return {**arrs, **rest}

    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
