"""Edge-partitioned GAT vs the unsharded GATConv stack (8-device CPU
mesh): attention softmax is receiver-local under receiver-owned edge
partitioning, so the sharded forward must match the flat single-device
layer exactly; 1-vs-N-device losses must agree."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_voc_superpixels
from graph_hscn_tpu.models.layers import GATConv
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import (init_sharded_gat_params,
                                                 make_sharded_gat,
                                                 shard_node_blocks)


def _setup(D=8):
    graphs = make_voc_superpixels(num_graphs=4, seed=7, mean_nodes=250)
    budget = PadBudget.for_dataset(graphs, batch_size=4,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask),
                                 b.num_nodes_padded, D)
    return b, plan_np


def _unsharded_forward(params, batch):
    """Same math via the single-device GATConv (heads=1,
    add_self_loops=True — the sharded path's semantics)."""
    x = batch.node_feat
    n = batch.num_nodes_padded
    for i, layer in enumerate(params):
        C = layer["kernel"].shape[1]
        conv = GATConv(features=C, heads=1, add_self_loops=True)
        vars_ = {"params": {
            "kernel_src": layer["kernel"],
            "att_src": layer["att_src"].reshape(1, 1, C),
            "att_dst": layer["att_dst"].reshape(1, 1, C),
            "bias": layer["bias"],
        }}
        x = conv.apply(vars_, x, batch.senders, batch.receivers,
                       batch.edge_mask, num_nodes=n)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def test_sharded_gat_forward_matches_unsharded():
    D = 8
    b, plan_np = _setup(D)
    mesh = make_mesh(("data",), (D,))
    dims = [14, 16, 21]
    params = init_sharded_gat_params(jax.random.PRNGKey(0), dims)
    forward, _ = make_sharded_gat(mesh, num_layers=len(dims) - 1)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    (xb,) = shard_node_blocks(mesh, D, np.asarray(b.node_feat))
    got = np.asarray(forward(params, xb, plan)).reshape(
        b.num_nodes_padded, -1)
    want = np.asarray(_unsharded_forward(params, b))
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(got[mask], want[mask], rtol=2e-4, atol=2e-5)


def test_sharded_gat_loss_matches_single_device():
    b, plan_np = _setup(8)
    dims = [14, 16, 21]
    params = init_sharded_gat_params(jax.random.PRNGKey(1), dims)
    losses = {}
    for D in (1, 8):
        mesh = make_mesh(("data",), (D,))
        plan_d = plan_halo_exchange(np.asarray(b.senders),
                                    np.asarray(b.receivers),
                                    np.asarray(b.edge_mask),
                                    b.num_nodes_padded, D)
        plan = {k: jnp.asarray(v) for k, v in plan_d.items()
                if k not in ("block_size", "halo_width")}
        _, vg = make_sharded_gat(mesh, num_layers=len(dims) - 1)
        node_ok = np.asarray(b.node_mask)
        xb, yb, okb = shard_node_blocks(mesh, D, np.asarray(b.node_feat),
                                        np.asarray(b.node_y), node_ok)
        loss, grads = vg(params, xb, plan, yb, okb)
        losses[D] = float(loss)
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))
    np.testing.assert_allclose(losses[1], losses[8], rtol=1e-5)


def test_sharded_gat_multihead_matches_unsharded():
    """heads=2: hidden layer concatenates heads, output layer averages
    (models/mpnn.py layout) — allclose vs the flax GATConv stack with
    mapped weights, and CLI-reachable via mp.num_heads."""
    D = 8
    b, plan_np = _setup(D)
    mesh = make_mesh(("data",), (D,))
    n = b.num_nodes_padded
    dims = [14, 16, 21]
    H = 2
    params = init_sharded_gat_params(jax.random.PRNGKey(4), dims, heads=H)
    forward, _ = make_sharded_gat(mesh, num_layers=2)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    (xb,) = shard_node_blocks(mesh, D, np.asarray(b.node_feat))
    out = np.asarray(forward(params, xb, plan)).reshape(n, -1)

    x = jnp.asarray(b.node_feat)
    for i, layer in enumerate(params):
        Hh, C = layer["att_src"].shape
        last = i == len(params) - 1
        conv = GATConv(features=C, heads=Hh, concat=not last,
                       add_self_loops=True)
        vars_ = {"params": {
            "kernel_src": layer["kernel"],
            "att_src": layer["att_src"].reshape(1, Hh, C),
            "att_dst": layer["att_dst"].reshape(1, Hh, C),
            "bias": layer["bias"],
        }}
        x = conv.apply(vars_, x, b.senders, b.receivers, b.edge_mask,
                       num_nodes=n)
        if not last:
            x = jax.nn.relu(x)
    ref = np.asarray(x)
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], ref[mask], rtol=2e-4, atol=2e-4)

    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment
    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "mp": {"conv_type": "gat", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0,
               "num_heads": 2},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gat", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    result = run_experiment(parse_config(raw))
    assert result.epochs_run == 2
    assert np.isfinite(result.history[-1]["train_loss"])
