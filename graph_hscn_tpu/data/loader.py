"""Prefetching batch loader: background-thread packing with the native C++
batcher.

The host-side packing loop (flatten + counting sort + padding) is the data
pipeline's CPU cost; this loader overlaps it with device compute by packing
ahead on a worker thread — the TPU-side analog of the reference DataLoader's
``num_workers`` (loader.py:57-58, default 0 i.e. synchronous).  The native
packer releases the GIL inside the C call, so one worker thread achieves
true overlap.

Used by the host-batch (`fit`) path; the device-resident path
(train/device_data.py) packs once and doesn't need it.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from graph_hscn_tpu.data import native
from graph_hscn_tpu.data.batching import (GraphData, PadBudget, iter_batches,
                                          pack_batch)
from graph_hscn_tpu.data.structures import GraphBatch


class PrefetchLoader:
    """Iterable over packed batches with background packing.

    Falls back to synchronous numpy packing when the native library is
    unavailable (prefetching still applies).
    """

    def __init__(self, graphs: Sequence[GraphData], batch_size: int,
                 budget: PadBudget, shuffle: bool = False,
                 seed: int = 0, slot_nodes: int | None = None,
                 with_spmm_plan: bool = False, prefetch: int = 2):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.budget = budget
        self.shuffle = shuffle
        self.seed = seed
        self.slot_nodes = slot_nodes
        self.with_spmm_plan = with_spmm_plan
        self.prefetch = max(prefetch, 1)
        self._use_native = (native.native_available()
                            and not with_spmm_plan
                            and self.graphs
                            and self.graphs[0].y is not None
                            and self.graphs[0].edge_attr is None
                            and self.graphs[0].cluster is None
                            and self.graphs[0].eigvecs is None)

    def _chunks(self, epoch_seed: int):
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            np.random.default_rng(epoch_seed).shuffle(idx)
        for start in range(0, len(idx), self.batch_size):
            yield [self.graphs[int(i)]
                   for i in idx[start:start + self.batch_size]]

    def _pack_multi(self, chunk) -> list[GraphBatch]:
        """Pack one chunk; on (rare) budget overflow, split recursively."""
        try:
            if self._use_native:
                b = native.pack_batch_native(chunk, self.budget,
                                             slot_nodes=self.slot_nodes)
            else:
                b = pack_batch(chunk, self.budget,
                               slot_nodes=self.slot_nodes,
                               with_spmm_plan=self.with_spmm_plan)
            return [b]
        except ValueError:
            if len(chunk) == 1:
                raise
            mid = len(chunk) // 2
            return (self._pack_multi(chunk[:mid])
                    + self._pack_multi(chunk[mid:]))

    def epoch(self, epoch_seed: int | None = None) -> Iterator[GraphBatch]:
        seed = self.seed if epoch_seed is None else epoch_seed
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()

        def worker():
            try:
                for chunk in self._chunks(seed):
                    for b in self._pack_multi(chunk):
                        q.put(b)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()

    def __iter__(self):
        return self.epoch()
