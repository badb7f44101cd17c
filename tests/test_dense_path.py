"""Slotted dense execution path vs flat sparse path: identical math."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.config.config import HSCNConfig
from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.mpnn import MPNN
from graph_hscn_tpu.models.scn import build_scn


def _graphs():
    return make_peptides_func(num_graphs=6, seed=41, mean_nodes=40)


def _both_batches(graphs, cluster=False):
    budget = PadBudget.for_dataset(graphs, batch_size=6)
    sparse = pack_batch(graphs, budget)
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    dense = pack_batch(graphs, budget, slot_nodes=slot)
    return sparse, dense


def test_dense_batch_layout():
    graphs = _graphs()
    _, dense = _both_batches(graphs)
    slot = dense.slot_size
    assert dense.num_nodes_padded == (dense.num_graphs_padded - 1) * slot
    # Graph i occupies rows [i*slot, i*slot+n_i).
    for gi, g in enumerate(graphs):
        rows = np.asarray(dense.node_feat[gi * slot: gi * slot + g.num_nodes])
        np.testing.assert_allclose(rows, g.x, rtol=1e-6)
    from graph_hscn_tpu.ops.dense import build_dense_adj
    adj = np.asarray(build_dense_adj(dense))
    assert adj.shape == (dense.num_graphs_padded - 1, slot, slot)
    assert adj.sum() == sum(g.num_edges for g in graphs)


def test_gcn_dense_equals_sparse():
    graphs = _graphs()
    sparse, dense = _both_batches(graphs)
    model = MPNN(conv_type="gcn", activation="relu", num_features=9,
                 hidden_channels=16, num_classes=10, num_layers=3,
                 dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), sparse, train=False)
    out_sparse = np.asarray(model.apply(params, sparse, train=False))
    out_dense = np.asarray(model.apply(params, dense, train=False))
    G = int(sparse.graph_mask.sum())
    np.testing.assert_allclose(out_dense[:G], out_sparse[:G], rtol=2e-4,
                               atol=2e-4)


def test_gin_dense_equals_sparse():
    graphs = _graphs()
    sparse, dense = _both_batches(graphs)
    model = MPNN(conv_type="gin", activation="relu", num_features=9,
                 hidden_channels=16, num_classes=10, num_layers=2,
                 dropout=0.0)
    params = model.init(jax.random.PRNGKey(1), sparse, train=False)
    out_sparse = np.asarray(model.apply(params, sparse, train=False))
    out_dense = np.asarray(model.apply(params, dense, train=False))
    G = int(sparse.graph_mask.sum())
    np.testing.assert_allclose(out_dense[:G], out_sparse[:G], rtol=2e-4,
                               atol=2e-4)


def test_gat_dense_equals_sparse():
    graphs = _graphs()
    sparse, dense = _both_batches(graphs)
    model = MPNN(conv_type="gat", activation="relu", num_features=9,
                 hidden_channels=16, num_classes=10, num_layers=2,
                 dropout=0.0)
    params = model.init(jax.random.PRNGKey(3), sparse, train=False)
    out_sparse = np.asarray(model.apply(params, sparse, train=False))
    out_dense = np.asarray(model.apply(params, dense, train=False))
    G = int(sparse.graph_mask.sum())
    np.testing.assert_allclose(out_dense[:G], out_sparse[:G], rtol=2e-4,
                               atol=2e-4)


def test_scn_dense_equals_sparse():
    graphs = _graphs()
    sparse, dense = _both_batches(graphs)
    cfg = HSCNConfig(activation="relu", num_clusters=4, mp_units=[16])
    scn = build_scn(cfg, 9, max_nodes=64)
    params = scn.init(jax.random.PRNGKey(2), sparse, train=False)
    s1, mc1, o1 = scn.apply(params, sparse, train=False)
    s2, mc2, o2 = scn.apply(params, dense, train=False)
    np.testing.assert_allclose(float(mc1), float(mc2), rtol=1e-4)
    np.testing.assert_allclose(float(o1), float(o2), rtol=1e-4)
    # Per-node assignments match graph by graph.
    nm1 = np.asarray(sparse.node_mask)
    nm2 = np.asarray(dense.node_mask)
    np.testing.assert_allclose(np.asarray(s1)[nm1], np.asarray(s2)[nm2],
                               rtol=1e-4, atol=1e-5)
