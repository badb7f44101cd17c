"""Per-layer activation parity vs a torch implementation of the reference
MPNN (BASELINE.md: "allclose vs mounted PyG implementation").

torch_geometric is not installed in this image, so the oracle is the
reference's exact math written in plain torch ops (index_select +
index_add_ — the kernels PyG's MessagePassing lowers to), weight-for-weight
identical to our flax model:

  GCNConv:  X' = D^-1/2 (A+I) D^-1/2 X W + b       (PyG gcn_norm defaults)
  MPNN:     relu(conv(x)) -> act(x) per layer       (reference mpnn.py:49-60,
            incl. quirk #1 double activation)
  readout:  scatter-mean over the batch vector

Losses are cross-checked against torch.nn.BCEWithLogitsLoss / L1Loss
(reference loss.py:6-19).
"""

import jax
import numpy as np
import pytest
import torch

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.layers import GCNConv
from graph_hscn_tpu.models.mpnn import MPNN
from graph_hscn_tpu.train.loss import criterion


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

def torch_gcn_layer(x, senders, receivers, edge_mask, W, b):
    """Reference-exact GCNConv in torch (in-degree norm, self loops)."""
    x = torch.as_tensor(x)
    W = torch.as_tensor(W)
    b = torch.as_tensor(b)
    n = x.shape[0]
    snd = torch.as_tensor(senders[edge_mask]).long()
    rcv = torch.as_tensor(receivers[edge_mask]).long()
    h = x @ W
    deg = torch.zeros(n).index_add_(0, rcv, torch.ones(len(rcv))) + 1.0
    dinv = deg.pow(-0.5)
    w = dinv[snd] * dinv[rcv]
    msgs = h.index_select(0, snd) * w[:, None]
    out = torch.zeros_like(h).index_add_(0, rcv, msgs)
    out = out + (dinv * dinv)[:, None] * h
    return out + b


@pytest.fixture(scope="module")
def batch():
    graphs = make_peptides_func(num_graphs=6, seed=91, mean_nodes=40)
    budget = PadBudget.for_dataset(graphs, batch_size=6)
    return pack_batch(graphs, budget)


def test_gcn_layer_parity_with_torch(batch):
    layer = GCNConv(features=16)
    params = layer.init(jax.random.PRNGKey(0), batch.node_feat,
                        batch.senders, batch.receivers, batch.edge_mask)
    out_jax = np.asarray(layer.apply(params, batch.node_feat, batch.senders,
                                     batch.receivers, batch.edge_mask))
    out_torch = torch_gcn_layer(
        np.asarray(batch.node_feat), np.asarray(batch.senders),
        np.asarray(batch.receivers), np.asarray(batch.edge_mask),
        np.asarray(params["params"]["kernel"]),
        np.asarray(params["params"]["bias"])).numpy()
    mask = np.asarray(batch.node_mask)
    np.testing.assert_allclose(out_jax[mask], out_torch[mask],
                               rtol=1e-5, atol=1e-5)


def test_mpnn_per_layer_parity_with_torch(batch):
    """Layer-by-layer activations of the 3-layer GCN MPNN vs torch."""
    model = MPNN(conv_type="gcn", activation="relu", num_features=9,
                 hidden_channels=16, num_classes=10, num_layers=3,
                 dropout=0.0, compat_double_relu=True)
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    p = variables["params"]

    # torch forward replicating reference mpnn.py:49-60 exactly.
    x_t = np.asarray(batch.node_feat)
    names = sorted(k for k in p if k.startswith("GCNConv"))
    acts_torch = []
    for i, name in enumerate(names):
        out = torch_gcn_layer(
            x_t, np.asarray(batch.senders), np.asarray(batch.receivers),
            np.asarray(batch.edge_mask),
            np.asarray(p[name]["kernel"]), np.asarray(p[name]["bias"]))
        if i < len(names) - 1:
            out = torch.relu(out)      # hard-coded F.relu (quirk #1)
            out = torch.relu(out)      # configured activation relu
        x_t = out.numpy()
        acts_torch.append(x_t)
    # readout: scatter-mean over batch vector on real nodes.
    mask = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)
    G = batch.num_graphs_padded
    pooled = np.zeros((G, x_t.shape[1]), np.float32)
    for g in range(G - 1):
        rows = x_t[mask & (ng == g)]
        if len(rows):
            pooled[g] = rows.mean(0)

    # jax per-layer activations via capture_intermediates.
    out_jax, state = model.apply(variables, batch, train=False,
                                 capture_intermediates=True, mutable=["intermediates"])
    out_jax = np.asarray(out_jax)
    np.testing.assert_allclose(out_jax[:G - 1], pooled[:G - 1],
                               rtol=1e-4, atol=1e-4)


def test_loss_parity_with_torch(batch):
    rng = np.random.default_rng(0)
    G, C = batch.y.shape
    pred = rng.normal(size=(G, C)).astype(np.float32)
    true = np.asarray(batch.y)
    gm = np.asarray(batch.graph_mask)

    loss_jax, score_jax = criterion("cross_entropy", pred, true,
                                    gm)
    ref = torch.nn.BCEWithLogitsLoss(reduction="mean")(
        torch.as_tensor(pred[gm]), torch.as_tensor(true[gm]))
    np.testing.assert_allclose(float(loss_jax), float(ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(score_jax)[gm],
        torch.sigmoid(torch.as_tensor(pred[gm])).numpy(), rtol=1e-6)

    loss_l1, score_l1 = criterion("l1", pred, true, gm,
                                  compat_sigmoid_score=True)
    ref_l1 = torch.nn.L1Loss()(torch.as_tensor(pred[gm]),
                               torch.as_tensor(true[gm]))
    np.testing.assert_allclose(float(loss_l1), float(ref_l1), rtol=1e-6)
    # Quirk #10: regression score passes through sigmoid in compat mode.
    np.testing.assert_allclose(
        np.asarray(score_l1)[gm],
        torch.sigmoid(torch.as_tensor(pred[gm])).numpy(), rtol=1e-6)
