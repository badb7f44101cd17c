"""Batch packing invariants: padding, CSR ordering, dense round-trip."""

import numpy as np
import pytest

from graph_hscn_tpu.data import batching, synthetic
from graph_hscn_tpu.data.batching import PadBudget, pack_batch


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

@pytest.fixture(scope="module")
def graphs():
    return synthetic.make_peptides_func(num_graphs=40, seed=0, mean_nodes=40)


def test_pack_shapes_and_masks(graphs):
    budget = PadBudget.for_dataset(graphs, batch_size=8)
    b = pack_batch(graphs[:8], budget)
    assert b.node_feat.shape[0] == budget.num_nodes
    assert b.senders.shape[0] == budget.num_edges
    assert b.n_node.shape[0] == 9
    assert b.node_mask.sum() == sum(g.num_nodes for g in graphs[:8])
    assert b.edge_mask.sum() == sum(g.num_edges for g in graphs[:8])
    assert b.graph_mask.sum() == 8
    # Padding edges are self-loops on the final padding node.
    pad = ~b.edge_mask
    assert (b.senders[pad] == budget.num_nodes - 1).all()
    assert (b.receivers[pad] == budget.num_nodes - 1).all()
    # Padding nodes belong to the dummy final graph.
    assert (b.node_graph[~b.node_mask] == 8).all()


def test_csr_sorted(graphs):
    budget = PadBudget.for_dataset(graphs, batch_size=8)
    b = pack_batch(graphs[:8], budget)
    assert (np.diff(b.receivers) >= 0).all()
    rowptr = batching.csr_row_pointers(b.receivers, budget.num_nodes)
    assert rowptr[-1] == budget.num_edges
    # Each row segment has matching receivers.
    for i in [0, 5, budget.num_nodes - 1]:
        seg = b.receivers[rowptr[i]:rowptr[i + 1]]
        assert (seg == i).all()


def test_edge_endpoints_within_graph(graphs):
    budget = PadBudget.for_dataset(graphs, batch_size=8)
    b = pack_batch(graphs[:8], budget)
    real = b.edge_mask
    assert (b.node_graph[b.senders[real]]
            == b.node_graph[b.receivers[real]]).all()


def test_iter_batches_covers_all(graphs):
    budget = PadBudget.for_dataset(graphs, batch_size=8)
    batches = list(batching.iter_batches(graphs, 8, budget))
    total = sum(int(b.graph_mask.sum()) for b in batches)
    assert total == len(graphs)


def test_dense_round_trip(graphs):
    budget = PadBudget.for_dataset(graphs[:4], batch_size=4)
    b = pack_batch(graphs[:4], budget)
    n_max = int(max(g.num_nodes for g in graphs[:4]))
    d = batching.to_dense(b, n_max)
    # Node features recoverable.
    off = 0
    for gi, g in enumerate(graphs[:4]):
        np.testing.assert_allclose(d.x[gi, :g.num_nodes], g.x, rtol=1e-6)
        # Adjacency has exactly e edges.
        assert d.adj[gi].sum() == g.num_edges
        off += g.num_nodes
    # Dense adjacency matches edge list.
    g0 = graphs[0]
    for s, r in g0.edge_index.T[:20]:
        assert d.adj[0, r, s] == 1.0


def test_bucketed_budgets_cover_and_save_padding():
    """Shape-bucketed batching: <= K distinct compiled shapes, every graph
    packed exactly once, and less node padding than the single budget on a
    size-skewed dataset."""
    from graph_hscn_tpu.data.batching import (GraphData, PadBudget,
                                              bucketed_budgets, iter_batches)

    rng = np.random.default_rng(11)
    # Heavy size skew: small molecules + a long tail of big ones.
    graphs = []
    for i in range(160):
        n = int(rng.integers(10, 30)) if i % 4 else int(rng.integers(80, 150))
        ei = np.stack([rng.integers(0, n, 3 * n), rng.integers(0, n, 3 * n)])
        graphs.append(GraphData(x=rng.normal(size=(n, 5)).astype(np.float32),
                                edge_index=ei.astype(np.int64),
                                y=np.zeros(3, np.float32)))
    bs = 16
    buckets = bucketed_budgets(graphs, bs, num_buckets=3)
    assert 1 < len(buckets) <= 3
    assert all(b.num_nodes <= buckets[-1].num_nodes for b in buckets)

    batches = list(iter_batches(graphs, bs, buckets, shuffle=True,
                                rng=np.random.default_rng(0)))
    shapes = {b.node_feat.shape for b in batches}
    assert len(shapes) <= 3
    # Every graph exactly once.
    assert sum(int(b.graph_mask.sum()) for b in batches) == len(graphs)
    for b in batches:
        assert int(b.node_mask.sum()) == sum(
            int(n) for n in b.n_node[np.asarray(b.graph_mask)])

    single = PadBudget.for_dataset(graphs, bs)
    padded_bucketed = sum(b.node_feat.shape[0] for b in batches)
    batches_single = list(iter_batches(graphs, bs, single, shuffle=True,
                                       rng=np.random.default_rng(0)))
    padded_single = sum(b.node_feat.shape[0] for b in batches_single)
    assert padded_bucketed < padded_single


def test_spmm_tile_width_pinned_across_batches():
    """iter_batches pins the plan tile width per bucket so shuffled batch
    compositions can't flip the SpmmPlanArrays shapes (each flip would
    force a retrace+recompile of the jitted train step)."""
    rng = np.random.default_rng(5)
    graphs = []
    # Mixed sizes so the widest feasible tile would naturally vary batch
    # to batch under auto selection.
    for i in range(96):
        n = int(rng.integers(12, 28)) if i % 3 else int(rng.integers(90, 160))
        ei = np.stack([rng.integers(0, n, 3 * n), rng.integers(0, n, 3 * n)])
        graphs.append(batching.GraphData(
            x=rng.normal(size=(n, 5)).astype(np.float32),
            edge_index=ei.astype(np.int64),
            y=np.zeros(3, np.float32)))
    from graph_hscn_tpu.ops.pallas.spmm_kernel import PLAN_CANDIDATES
    budget = PadBudget.for_dataset(graphs, 16)
    for trial in range(3):
        batches = list(batching.iter_batches(
            graphs, 16, budget, shuffle=True,
            rng=np.random.default_rng(trial), with_spmm_plan=True))
        pairs = [(b.spmm.snd_rel.shape[1], b.spmm.window)
                 for b in batches if b.spmm is not None]
        # The pin may move, but only monotonically toward more permissive
        # candidates — never flip back and forth (each distinct geometry
        # costs one retrace, so the count must stay small and ordered).
        idxs = [PLAN_CANDIDATES.index(p) for p in pairs]
        assert idxs == sorted(idxs), pairs
        assert len(set(pairs)) <= 2, pairs


def test_pack_batch_fixed_spmm_tile():
    """spmm_tile pins the plan width; infeasible pins yield None (fallback),
    never a silently different shape."""
    graphs = synthetic.make_peptides_func(num_graphs=8, seed=3,
                                          mean_nodes=40)
    budget = PadBudget.for_dataset(graphs, 8)
    b = pack_batch(graphs, budget, with_spmm_plan=True, spmm_tile=256)
    assert b.spmm is not None and b.spmm.snd_rel.shape[1] == 256
