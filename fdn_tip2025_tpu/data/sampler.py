"""Deterministic epoch-seeded sampler (EnlargedSampler equivalent).

Parity: reference basicsr/data/data_sampler.py — dataset-enlarge ratio,
epoch-seeded randperm (:30-43). Difference: instead of per-rank index
interleaving (indices[rank::world]) for N processes, we run single-process
SPMD: the sampler yields the *global* batch and the train step shards it
over the device mesh, which is the jax-native equivalent.
"""

import numpy as np


class EnlargedSampler:
    def __init__(self, num_samples, enlarge_ratio=1, seed=0):
        self.num_samples = num_samples
        self.total = int(num_samples * enlarge_ratio)
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def indices(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        idx = rng.permutation(self.total) % self.num_samples
        return idx

    def __iter__(self):
        return iter(self.indices())

    def __len__(self):
        return self.total
