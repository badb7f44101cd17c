"""Round-2 fix coverage (VERDICT.md items 5, 6, 9 + ADVICE item 1):

- per-epoch reshuffling in the host `fit` path (reference
  DataLoader(shuffle=True) draws fresh batch compositions each epoch,
  loader.py:48-60);
- weighted-degree gcn_norm (PyG gcn_norm computes deg from edge weights);
- multi-head GAT reachable from config (mp.num_heads with conv_type: gat);
- cosine schedule horizon under batch_accumulation (optax.MultiSteps
  advances the inner schedule once per k mini-batches).
"""

import jax
import numpy as np
import optax
import pytest
import torch

from graph_hscn_tpu.config.config import DataConfig, MPNNConfig
from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.layers import GATConv, GCNConv
from graph_hscn_tpu.models.mpnn import build_mpnn
from graph_hscn_tpu.train.optimizers import build_optimizer


# ---------------------------------------------------------------- reshuffle

def _first_batch_sig(dm, epoch):
    b = next(iter(dm.train_batches(epoch_seed=dm.seed + epoch)))
    return np.asarray(b.n_node).tolist(), np.asarray(b.y).tolist()


def test_train_batches_reshuffle_across_epochs():
    dm = DataModule.from_config(
        DataConfig(dataset_name="peptides_func", batch_size=8,
                   num_graphs=64, num_buckets=1))
    sig0 = _first_batch_sig(dm, 0)
    sig1 = _first_batch_sig(dm, 1)
    assert sig0 != sig1, "epoch 0 and 1 saw identical first-batch composition"
    # Deterministic per epoch: same seed -> same composition.
    assert sig0 == _first_batch_sig(dm, 0)


def test_fit_threads_epoch_into_batches_fn():
    from graph_hscn_tpu.config.config import OptimConfig, TrainingConfig
    from graph_hscn_tpu.train.loop import fit
    from graph_hscn_tpu.utils.logger import Logger

    dm = DataModule.from_config(
        DataConfig(dataset_name="peptides_func", batch_size=8,
                   num_graphs=24, num_buckets=1))
    model = build_mpnn(
        MPNNConfig(conv_type="gcn", activation="relu", hidden_channels=8,
                   num_layers=2, dropout=0.0),
        dm.num_features, dm.num_classes)
    seen = []

    def batches(epoch):
        seen.append(epoch)
        return dm.train_batches(epoch_seed=dm.seed + epoch)

    fit(model, batches, dm.eval_batches("val"), dm.eval_batches("test"),
        OptimConfig(optim_type="adamW", lr=1e-3, weight_decay=0.0),
        TrainingConfig(model_type="gcn", use_wandb=False,
                       loss_fn="cross_entropy", metric="ap", epochs=3,
                       eval_period=2, patience=50, min_delta=0.0),
        Logger(metric_name="ap"))
    # fit calls batches(0) once for the example batch, then one call per
    # training epoch with the true epoch index.
    assert seen[-3:] == [0, 1, 2]


# ------------------------------------------------------ weighted gcn_norm

def _torch_gcn_weighted(x, snd, rcv, w_edge, W, b):
    """PyG gcn_norm with edge_weight: deg = scatter_add(edge_weight) + 1
    (self-loop weight 1), norm = dinv[s] * w_e * dinv[r]."""
    x = torch.as_tensor(x)
    W = torch.as_tensor(W)
    b = torch.as_tensor(b)
    w_edge = torch.as_tensor(w_edge)
    n = x.shape[0]
    snd = torch.as_tensor(snd).long()
    rcv = torch.as_tensor(rcv).long()
    h = x @ W
    deg = torch.zeros(n).index_add_(0, rcv, w_edge) + 1.0
    dinv = deg.pow(-0.5)
    norm = dinv[snd] * w_edge * dinv[rcv]
    msgs = h.index_select(0, snd) * norm[:, None]
    out = torch.zeros_like(h).index_add_(0, rcv, msgs)
    out = out + (dinv * dinv)[:, None] * h   # self-loop, weight 1
    return (out + b).numpy()


def test_gcn_weighted_degree_parity_with_torch():
    graphs = make_peptides_func(num_graphs=4, seed=7, mean_nodes=30)
    budget = PadBudget.for_dataset(graphs, batch_size=4)
    b = pack_batch(graphs, budget)
    rng = np.random.default_rng(3)
    w_edge = rng.uniform(0.1, 2.0, size=b.senders.shape[0]).astype(np.float32)

    layer = GCNConv(features=12)
    params = layer.init(jax.random.PRNGKey(0), b.node_feat, b.senders,
                        b.receivers, b.edge_mask)
    out = np.asarray(layer.apply(
        params, b.node_feat, b.senders, b.receivers, b.edge_mask,
        edge_weight=jax.numpy.asarray(w_edge)))

    msk = np.asarray(b.edge_mask)
    expected = _torch_gcn_weighted(
        np.asarray(b.node_feat), np.asarray(b.senders)[msk],
        np.asarray(b.receivers)[msk], w_edge[msk],
        np.asarray(params["params"]["kernel"]),
        np.asarray(params["params"]["bias"]))
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], expected[mask], rtol=2e-4,
                               atol=2e-4)


# ----------------------------------------------------------- multi-head GAT

def _numpy_gat_multihead(x, snd, rcv, msk, W, a_s, a_d, bias, H, C,
                         slope=0.2):
    """Per-head softmax attention, add_self_loops=False, concat=True."""
    n = x.shape[0]
    h = (x @ W).reshape(n, H, C)
    out = np.zeros((n, H, C))
    for i in range(n):
        edges = [e for e in range(len(snd)) if rcv[e] == i and msk[e]]
        if not edges:
            continue
        for hd in range(H):
            logits = []
            for e in edges:
                z = h[snd[e], hd] @ a_s[hd] + h[i, hd] @ a_d[hd]
                logits.append(z if z > 0 else slope * z)
            logits = np.array(logits)
            w = np.exp(logits - logits.max())
            w = w / w.sum()
            out[i, hd] = sum(wi * h[snd[e], hd] for wi, e in zip(w, edges))
    return out.reshape(n, H * C) + bias


def test_gat_multihead_matches_numpy_oracle():
    graphs = make_peptides_func(num_graphs=3, seed=11, mean_nodes=20)
    budget = PadBudget.for_dataset(graphs, batch_size=3)
    b = pack_batch(graphs, budget)
    H, C = 2, 6
    layer = GATConv(features=C, heads=H, add_self_loops=False)
    params = layer.init(jax.random.PRNGKey(4), b.node_feat, b.senders,
                        b.receivers, b.edge_mask)
    out = np.asarray(layer.apply(params, b.node_feat, b.senders,
                                 b.receivers, b.edge_mask))
    p = params["params"]
    expected = _numpy_gat_multihead(
        np.asarray(b.node_feat), np.asarray(b.senders),
        np.asarray(b.receivers), np.asarray(b.edge_mask),
        np.asarray(p["kernel_src"]),
        np.asarray(p["att_src"]).reshape(H, C),
        np.asarray(p["att_dst"]).reshape(H, C),
        np.asarray(p["bias"]), H, C)
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], expected[mask], rtol=1e-4,
                               atol=1e-4)


def test_multihead_gat_reachable_from_config():
    dm = DataModule.from_config(
        DataConfig(dataset_name="peptides_func", batch_size=4,
                   num_graphs=12))
    cfg = MPNNConfig(conv_type="gat", activation="relu",
                     hidden_channels=16, num_layers=3, dropout=0.0,
                     num_heads=4)
    model = build_mpnn(cfg, dm.num_features, dm.num_classes)
    batch = dm.example_batch()
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)
    assert out.shape == (np.asarray(batch.y).shape[0], dm.num_classes)
    assert np.isfinite(np.asarray(out)).all()
    # Hidden layers split width across heads: kernel_src of layer 0 maps
    # num_features -> heads * (hidden // heads) = hidden.
    k0 = jax.tree_util.tree_leaves(
        params["params"]["GATConv_0"]["kernel_src"])[0]
    assert k0.shape[-1] == 16


def test_gat_heads_must_divide_hidden():
    with pytest.raises(ValueError):
        MPNNConfig(conv_type="gat", activation="relu", hidden_channels=10,
                   num_layers=2, num_heads=4)


# ------------------------------------- cosine + batch_accumulation horizon

def test_cosine_completes_horizon_under_batch_accumulation():
    import jax.numpy as jnp

    total_mini = 40   # mini-batches: 20 optimizer updates at k=2
    tx = build_optimizer("adamW", 0.1, 0.0, batch_accumulation=2,
                         schedule="cosine", total_steps=total_mini)
    params = {"w": jnp.ones(4)}
    state = tx.init(params)
    grads = {"w": jnp.ones(4)}
    applied = []
    for _ in range(total_mini):
        upd, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, upd)
        applied.append(float(jnp.abs(upd["w"]).max()))
    # The final accumulation boundary uses the last inner-schedule step.
    # With the horizon converted to optimizer updates (20), the cosine has
    # fully decayed: |update| ~ lr(19) ~ 6e-4.  The unconverted bug would
    # leave it at the cosine midpoint, ~ 0.05.
    assert max(applied[-2:]) < 0.01
    # Early boundaries run near peak LR.
    assert max(applied[:4]) > 0.05


def test_gps_head_dim_warning():
    """MXU-hostile GPS head dims (hidden/num_heads < 128) warn at config
    time with the measured padded-contraction cost (VERDICT r2 item 8)."""
    import warnings

    from graph_hscn_tpu.config.config import MPNNConfig

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        MPNNConfig(conv_type="gps", activation="relu", hidden_channels=64,
                   num_heads=4)
    assert any("head_dim" in str(w.message) for w in rec)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        MPNNConfig(conv_type="gps", activation="relu",
                   hidden_channels=256, num_heads=2)
    assert not any("head_dim" in str(w.message) for w in rec)
