"""Native C++ batcher vs numpy reference packer: identical batches."""

import numpy as np
import pytest

from graph_hscn_tpu.data import native
from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def graphs():
    return make_peptides_func(num_graphs=12, seed=50, mean_nodes=50)


def _assert_batches_equal(a, b):
    np.testing.assert_allclose(a.node_feat, b.node_feat)
    np.testing.assert_array_equal(a.senders, b.senders)
    np.testing.assert_array_equal(a.receivers, b.receivers)
    np.testing.assert_array_equal(a.node_graph, b.node_graph)
    np.testing.assert_array_equal(a.n_node, b.n_node)
    np.testing.assert_array_equal(a.n_edge, b.n_edge)
    np.testing.assert_array_equal(a.node_mask, b.node_mask)
    np.testing.assert_array_equal(a.edge_mask, b.edge_mask)
    np.testing.assert_array_equal(a.graph_mask, b.graph_mask)
    np.testing.assert_allclose(a.y, b.y)
    assert a.slot == b.slot


def test_native_matches_numpy_contiguous(graphs):
    budget = PadBudget.for_dataset(graphs, batch_size=12)
    ref = pack_batch(graphs, budget)
    nat = native.pack_batch_native(graphs, budget)
    _assert_batches_equal(nat, ref)


def test_native_matches_numpy_slotted(graphs):
    budget = PadBudget.for_dataset(graphs, batch_size=12)
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    ref = pack_batch(graphs, budget, slot_nodes=slot)
    nat = native.pack_batch_native(graphs, budget, slot_nodes=slot,
                                   materialize_dense=True)
    _assert_batches_equal(nat, ref)
    # Host-materialized adjacency == device-built adjacency.
    from graph_hscn_tpu.ops.dense import build_dense_adj
    dev = np.asarray(build_dense_adj(ref))
    np.testing.assert_allclose(nat.dense_adj, dev)


def test_native_spmm_windows_match(graphs):
    from graph_hscn_tpu.ops.pallas.spmm_kernel import (TILE_EDGES, WINDOW,
                                                       spmm_plan)
    budget = PadBudget.for_dataset(graphs, batch_size=12,
                                   edge_multiple=TILE_EDGES)
    b = pack_batch(graphs, budget)
    plan = spmm_plan(np.asarray(b.senders), np.asarray(b.receivers),
                     np.asarray(b.edge_mask), b.num_nodes_padded)
    nat = native.spmm_windows_native(
        np.asarray(b.senders), np.asarray(b.receivers),
        np.asarray(b.edge_mask), b.num_nodes_padded, TILE_EDGES, WINDOW)
    assert nat is not None
    ws, wr, snd_rel, rcv_rel = nat
    np.testing.assert_array_equal(ws, plan.ws)
    np.testing.assert_array_equal(wr, plan.wr)
    np.testing.assert_array_equal(snd_rel, plan.snd_rel)
    np.testing.assert_array_equal(rcv_rel, plan.rcv_rel)
