"""PyG-style DataLoader over lists of Data / HeteroData
(loader.py:48-60, train.py:73,125).  Shuffling draws from torch's default
generator, like PyG's sampler; ``num_workers``/``persistent_workers`` are
accepted and ignored (the reference defaults them to 0/False,
defaults.py:3)."""

from __future__ import annotations

import math

import torch

from ..data.batch import Batch


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 0, persistent_workers: bool = False,
                 **kwargs):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle

    def __len__(self):
        return max(1, math.ceil(len(self.dataset) / self.batch_size))

    def __iter__(self):
        n = len(self.dataset)
        order = torch.randperm(n) if self.shuffle else torch.arange(n)
        for s in range(0, n, self.batch_size):
            items = [self.dataset[int(i)] for i in order[s:s +
                                                         self.batch_size]]
            yield Batch.from_data_list(items)
