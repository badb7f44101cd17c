"""Per-layer parity: flax layers vs independent numpy transcriptions of the
PyG equations (GCNConv / GraphConv / GATConv), and padding invariance.

torch_geometric is not installed in this environment, so the parity oracle is
a direct numpy implementation of the documented PyG math; the layer
docstrings cite the reference call sites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.layers import GATConv, GCNConv, GINConv, GraphConv


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

@pytest.fixture(scope="module")
def small_batch():
    graphs = make_peptides_func(num_graphs=4, seed=3, mean_nodes=25)
    budget = PadBudget.for_dataset(graphs, batch_size=4)
    return pack_batch(graphs, budget)


def dense_adj(batch):
    n = batch.node_feat.shape[0]
    a = np.zeros((n, n))
    for s, r, m in zip(np.asarray(batch.senders), np.asarray(batch.receivers),
                       np.asarray(batch.edge_mask)):
        if m:
            a[r, s] += 1.0
    return a


def test_gcn_matches_numpy(small_batch):
    b = small_batch
    n = b.node_feat.shape[0]
    layer = GCNConv(features=8)
    params = layer.init(jax.random.PRNGKey(0), b.node_feat, b.senders,
                        b.receivers, b.edge_mask)
    out = layer.apply(params, b.node_feat, b.senders, b.receivers,
                      b.edge_mask)

    # numpy oracle:  D^-1/2 (A+I) D^-1/2 X W + bias, deg = in-degree + 1.
    W = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    A = dense_adj(b)
    mask = np.asarray(b.node_mask)
    A_hat = A + np.eye(n)
    deg = A_hat.sum(axis=1)
    dinv = 1 / np.sqrt(deg)
    norm_A = dinv[:, None] * A_hat * dinv[None, :]
    expected = norm_A @ (np.asarray(b.node_feat) @ W) + bias
    np.testing.assert_allclose(np.asarray(out)[mask], expected[mask],
                               rtol=2e-5, atol=2e-5)


def test_graphconv_matches_numpy(small_batch):
    b = small_batch
    layer = GraphConv(features=8)
    ew = np.random.default_rng(0).uniform(
        0.5, 1.5, size=b.senders.shape).astype(np.float32)
    params = layer.init(jax.random.PRNGKey(1), b.node_feat, b.senders,
                        b.receivers, b.edge_mask, edge_weight=jnp.array(ew))
    out = layer.apply(params, b.node_feat, b.senders, b.receivers,
                      b.edge_mask, edge_weight=jnp.array(ew))

    Wrel = np.asarray(params["params"]["kernel_rel"])
    Wroot = np.asarray(params["params"]["kernel_root"])
    bias = np.asarray(params["params"]["bias"])
    x = np.asarray(b.node_feat)
    n = x.shape[0]
    agg = np.zeros_like(x)
    for e, (s, r) in enumerate(zip(np.asarray(b.senders),
                                   np.asarray(b.receivers))):
        if b.edge_mask[e]:
            agg[r] += ew[e] * x[s]
    expected = agg @ Wrel + x @ Wroot + bias
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(np.asarray(out)[mask], expected[mask],
                               rtol=2e-5, atol=2e-5)


def test_gat_no_self_loops_matches_numpy(small_batch):
    b = small_batch
    layer = GATConv(features=8, heads=1, add_self_loops=False)
    params = layer.init(jax.random.PRNGKey(2), b.node_feat, b.senders,
                        b.receivers, b.edge_mask)
    out = np.asarray(layer.apply(params, b.node_feat, b.senders,
                                 b.receivers, b.edge_mask))

    p = params["params"]
    W = np.asarray(p["kernel_src"])
    a_s = np.asarray(p["att_src"]).reshape(-1)
    a_d = np.asarray(p["att_dst"]).reshape(-1)
    bias = np.asarray(p["bias"])
    x = np.asarray(b.node_feat)
    h = x @ W
    n = x.shape[0]
    snd = np.asarray(b.senders)
    rcv = np.asarray(b.receivers)
    msk = np.asarray(b.edge_mask)
    slope = 0.2
    expected = np.zeros((n, 8))
    for i in range(n):
        edges = [e for e in range(len(snd)) if rcv[e] == i and msk[e]]
        if not edges:
            continue
        logits = []
        for e in edges:
            z = h[snd[e]] @ a_s + h[i] @ a_d
            logits.append(z if z > 0 else slope * z)
        logits = np.array(logits)
        w = np.exp(logits - logits.max())
        w = w / w.sum()
        expected[i] = sum(wi * h[snd[e]] for wi, e in zip(w, edges))
    expected = expected + bias
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], expected[mask], rtol=1e-4,
                               atol=1e-4)


def test_gat_self_loop_softmax(small_batch):
    """With add_self_loops, every node's self edge joins the softmax."""
    b = small_batch
    layer = GATConv(features=4, heads=2, add_self_loops=True)
    params = layer.init(jax.random.PRNGKey(3), b.node_feat, b.senders,
                        b.receivers, b.edge_mask)
    out = np.asarray(layer.apply(params, b.node_feat, b.senders,
                                 b.receivers, b.edge_mask))
    assert np.isfinite(out).all()
    # An isolated padding node should still produce finite output
    # (self-loop alpha = 1) equal to its projected features + bias.
    p = params["params"]
    W = np.asarray(p["kernel_src"])
    bias = np.asarray(p["bias"])
    pad_idx = int(np.nonzero(~np.asarray(b.node_mask))[0][0])
    h_pad = (np.asarray(b.node_feat)[pad_idx] @ W)
    # pad node has only masked (padding) incoming edges -> alpha_self = 1.
    np.testing.assert_allclose(out[pad_idx], h_pad + bias, rtol=1e-5,
                               atol=1e-5)


def test_padding_invariance():
    """Doubling the padding must not change real-node outputs."""
    graphs = make_peptides_func(num_graphs=4, seed=5, mean_nodes=25)
    small = PadBudget.for_dataset(graphs, batch_size=4)
    big = PadBudget(num_nodes=small.num_nodes * 2,
                    num_edges=small.num_edges * 2,
                    num_graphs=small.num_graphs + 3)
    b1 = pack_batch(graphs, small)
    b2 = pack_batch(graphs, big)
    for layer in (GCNConv(features=8), GraphConv(features=8),
                  GINConv(features=8),
                  GATConv(features=8, add_self_loops=False)):
        params = layer.init(jax.random.PRNGKey(0), b1.node_feat, b1.senders,
                            b1.receivers, b1.edge_mask)
        o1 = np.asarray(layer.apply(params, b1.node_feat, b1.senders,
                                    b1.receivers, b1.edge_mask))
        o2 = np.asarray(layer.apply(params, b2.node_feat, b2.senders,
                                    b2.receivers, b2.edge_mask))
        m1 = np.asarray(b1.node_mask)
        m2 = np.asarray(b2.node_mask)
        np.testing.assert_allclose(o1[m1], o2[m2], rtol=2e-5, atol=2e-5,
                                   err_msg=type(layer).__name__)
