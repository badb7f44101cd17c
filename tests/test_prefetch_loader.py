"""PrefetchLoader: coverage, determinism, native/numpy agreement."""

import numpy as np

from graph_hscn_tpu.data.batching import PadBudget
from graph_hscn_tpu.data.loader import PrefetchLoader
from graph_hscn_tpu.data.synthetic import make_peptides_func


def test_prefetch_covers_dataset():
    graphs = make_peptides_func(num_graphs=37, seed=77, mean_nodes=40)
    budget = PadBudget.for_dataset(graphs, batch_size=8)
    loader = PrefetchLoader(graphs, 8, budget, shuffle=True, seed=3)
    batches = list(loader)
    total = sum(int(b.graph_mask.sum()) for b in batches)
    assert total == 37
    # Same seed -> identical batch composition.
    again = list(loader.epoch(3))
    for a, b in zip(batches, again):
        np.testing.assert_allclose(a.y, b.y)


def test_prefetch_slotted():
    graphs = make_peptides_func(num_graphs=16, seed=78, mean_nodes=40)
    budget = PadBudget.for_dataset(graphs, batch_size=4)
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    loader = PrefetchLoader(graphs, 4, budget, slot_nodes=slot)
    batches = list(loader)
    assert all(b.slot == slot for b in batches)
    assert sum(int(b.graph_mask.sum()) for b in batches) == 16
