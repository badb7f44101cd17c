"""Sharded GatedGCN (edge-featured gated message passing, receiver-resident
edge state) vs the flax GatedGCNNet with mapped weights on the 8-device
CPU mesh, plus partition invariance and the CLI route."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_voc_superpixels
from graph_hscn_tpu.models.gatedgcn import GatedGCNNet
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gatedgcn import (
    gather_edge_groups, init_sharded_gatedgcn_params, make_sharded_gatedgcn)
from graph_hscn_tpu.parallel.sharded_gcn import shard_node_blocks

D = 8
HID = 16
L = 2
FE = 3


def _setup(num_devices=D):
    rng = np.random.default_rng(23)
    graphs = make_voc_superpixels(num_graphs=4, seed=23, mean_nodes=80)
    graphs = [g.replace(edge_attr=rng.normal(
        size=(g.edge_index.shape[1], FE)).astype(np.float32))
        for g in graphs]
    budget = PadBudget.for_dataset(graphs, batch_size=4,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, num_devices)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    return b, plan_np, plan, n


def _map_params(p):
    """Sharded param pytree -> flax GatedGCNNet variables (edge-featured:
    Dense_0 node enc, Dense_1 edge enc, GatedGCNConv_i {Dense_0..4 =
    A,B,C,D,E; LayerNorm_0 x, LayerNorm_1 e}, Dense_2 head)."""
    out = {"Dense_0": p["enc_x"], "Dense_1": p["enc_e"],
           "Dense_2": p["head"]}
    for i, layer in enumerate(p["layers"]):
        out[f"GatedGCNConv_{i}"] = {
            "Dense_0": layer["A"], "Dense_1": layer["B"],
            "Dense_2": layer["C"], "Dense_3": layer["D"],
            "Dense_4": layer["E"],
            "LayerNorm_0": layer["ln_x"], "LayerNorm_1": layer["ln_e"],
        }
    return {"params": out}


def test_sharded_gatedgcn_matches_flax():
    b, plan_np, plan, n = _setup()
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_gatedgcn_params(jax.random.PRNGKey(8), 14, FE,
                                          HID, 21, L)
    forward, _ = make_sharded_gatedgcn(mesh, L)
    el, eh = gather_edge_groups(b.edge_feat, plan_np)
    xb, okb = shard_node_blocks(mesh, D, np.asarray(b.node_feat),
                                np.asarray(b.node_mask))
    from graph_hscn_tpu.parallel.edge_partition import shard_arrays
    elb, ehb = shard_arrays(mesh, el, eh)
    out = np.asarray(forward(params, xb, elb, ehb, okb, plan)).reshape(
        n, -1)

    flax_model = GatedGCNNet(hidden_channels=HID, num_classes=21,
                             num_layers=L, dropout=0.0, readout="none")
    ref = np.asarray(flax_model.apply(_map_params(params), b,
                                      train=False))
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], ref[mask], rtol=2e-4, atol=2e-4)


def test_sharded_gatedgcn_partition_invariant_with_grads():
    b, _, _, n = _setup()
    params = init_sharded_gatedgcn_params(jax.random.PRNGKey(9), 14, FE,
                                          HID, 21, L)
    out = []
    for d in (1, D):
        mesh = make_mesh(("data",), (d,), devices=jax.devices()[:d])
        plan_np = plan_halo_exchange(np.asarray(b.senders),
                                     np.asarray(b.receivers),
                                     np.asarray(b.edge_mask), n, d)
        plan = {k: jnp.asarray(v) for k, v in plan_np.items()
                if k not in ("block_size", "halo_width")}
        _, vg = make_sharded_gatedgcn(mesh, L)
        el, eh = gather_edge_groups(b.edge_feat, plan_np)
        from graph_hscn_tpu.parallel.edge_partition import shard_arrays
        elb, ehb = shard_arrays(mesh, el, eh)
        xb, okb, yb = shard_node_blocks(mesh, d, np.asarray(b.node_feat),
                                        np.asarray(b.node_mask),
                                        np.asarray(b.node_y))
        loss, grads = vg(params, xb, elb, ehb, okb, plan, yb)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()
        out.append((float(loss),
                    float(jnp.linalg.norm(grads["layers"][0]["B"]
                                          ["kernel"]))))
    np.testing.assert_allclose(out[0][0], out[1][0], rtol=5e-5)
    np.testing.assert_allclose(out[0][1], out[1][1], rtol=1e-4)


def test_runner_edge_partitioned_gatedgcn():
    """conv_type: gatedgcn + mesh.edge_partition routes through the
    sharded GatedGCN (edge-feature-less VOC: zero edge state)."""
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 10},
        "mp": {"conv_type": "gatedgcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gatedgcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 3, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg)
    assert result.epochs_run == 3
    assert np.isfinite(result.history[-1]["train_loss"])
