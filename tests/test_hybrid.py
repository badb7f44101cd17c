"""Hybrid 2-D parallelism (DP graph groups x edge-partitioned blocks) on
the 8-virtual-device CPU mesh: forward/loss/grads must match the
single-device GCNConv reference over all graphs; GAT variant and the CLI
path are exercised too."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.data.synthetic import make_voc_superpixels
from graph_hscn_tpu.models.layers import GCNConv
from graph_hscn_tpu.parallel.hybrid import (balance_groups,
                                            build_hybrid_split)
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import (init_sharded_gat_params,
                                                 init_sharded_gcn_params,
                                                 make_sharded_gat,
                                                 make_sharded_gcn)

AXES = ("data", "model")


def _mesh(d_dp=2, d_ep=4):
    return make_mesh(AXES, (d_dp, d_ep))


def _setup(d_dp=2, d_ep=4, num_graphs=6, seed=11):
    graphs = make_voc_superpixels(num_graphs=num_graphs, seed=seed,
                                  mean_nodes=200)
    plan, x, y, ok, meta = build_hybrid_split(graphs, d_dp, d_ep)
    return graphs, plan, x, y, ok, meta


def _ref_group_forward(params, x_grp, snd, rcv, em, n):
    """Single-device GCNConv stack on one group's packed arrays."""
    h = x_grp
    for i, layer in enumerate(params):
        conv = GCNConv(features=layer["kernel"].shape[1])
        vars_ = {"params": {"kernel": layer["kernel"],
                            "bias": layer["bias"]}}
        h = conv.apply(vars_, h, jnp.asarray(snd), jnp.asarray(rcv),
                       jnp.asarray(em), num_nodes=n)
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h


def test_balance_groups_covers_all():
    graphs = make_voc_superpixels(num_graphs=7, seed=3, mean_nodes=150)
    groups = balance_groups(graphs, 3)
    assert sorted(i for g in groups for i in g) == list(range(7))
    assert all(g for g in groups)


def test_hybrid_forward_matches_unsharded():
    d_dp, d_ep = 2, 4
    graphs, plan, x, y, ok, meta = _setup(d_dp, d_ep)
    mesh = _mesh(d_dp, d_ep)
    dims = [14, 32, 21]
    params = init_sharded_gcn_params(jax.random.PRNGKey(0), dims)
    forward, _ = make_sharded_gcn(mesh, num_layers=len(dims) - 1,
                                  axis="model", shard_axes=AXES,
                                  grad_axes=AXES)
    nb = meta["block_size"]
    n = d_ep * nb
    out = np.asarray(forward(params, x, plan)).reshape(d_dp, n, -1)

    x_np = np.asarray(x).reshape(d_dp, n, -1)
    ok_np = np.asarray(ok).reshape(d_dp, n)
    for g, (snd, rcv, em) in enumerate(meta["group_edges"]):
        ref = np.asarray(_ref_group_forward(
            params, jnp.asarray(x_np[g]), snd, rcv, em, n))
        m = ok_np[g]
        np.testing.assert_allclose(out[g][m], ref[m], rtol=2e-4, atol=2e-4)


def test_hybrid_gradients_match_unsharded():
    d_dp, d_ep = 2, 4
    graphs, plan, x, y, ok, meta = _setup(d_dp, d_ep)
    mesh = _mesh(d_dp, d_ep)
    dims = [14, 16, 21]
    params = init_sharded_gcn_params(jax.random.PRNGKey(1), dims)
    _, value_and_grad = make_sharded_gcn(mesh, num_layers=len(dims) - 1,
                                         axis="model", shard_axes=AXES,
                                         grad_axes=AXES)
    loss, grads = value_and_grad(params, x, plan, y, ok)

    nb = meta["block_size"]
    n = d_ep * nb
    x_np = np.asarray(x).reshape(d_dp, n, -1)
    y_np = np.asarray(y).reshape(d_dp, n, -1)
    ok_np = np.asarray(ok).reshape(d_dp, n)

    def ref_loss(params):
        total = 0.0
        for g, (snd, rcv, em) in enumerate(meta["group_edges"]):
            logits = _ref_group_forward(
                params, jnp.asarray(x_np[g]), snd, rcv, em, n)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(jnp.asarray(y_np[g]) * logp, axis=-1)
            total = total + jnp.sum(per * jnp.asarray(ok_np[g],
                                                      logits.dtype))
        return total / float(ok_np.sum())

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-5)


def test_hybrid_gat_runs_and_learns():
    d_dp, d_ep = 2, 4
    graphs, plan, x, y, ok, meta = _setup(d_dp, d_ep, num_graphs=4, seed=5)
    mesh = _mesh(d_dp, d_ep)
    dims = [14, 16, 21]
    params = init_sharded_gat_params(jax.random.PRNGKey(2), dims)
    _, value_and_grad = make_sharded_gat(mesh, num_layers=len(dims) - 1,
                                         axis="model", shard_axes=AXES,
                                         grad_axes=AXES)
    loss, grads = value_and_grad(params, x, plan, y, ok)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_hybrid_cli_path(tmp_path):
    """mesh.axes [data, model] + edge_partition through the runner."""
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    cfg = parse_config({
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 16, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 4, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data", "model"], "shape": [2, 4],
                 "edge_partition": True},
    })
    result = run_experiment(cfg, log_file=tmp_path / "hybrid.log")
    hist = result.history
    assert np.isfinite(hist[-1]["train_loss"])
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]


def test_hybrid_gps_matches_flax_loss():
    """Ring-attention GPS on the 2x4 hybrid mesh: the K/V ring rides the
    model axis inside each data row (group-local graph-id masking), and
    the node-level CE equals the flax GPS loss on the same graphs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    from graph_hscn_tpu.data.synthetic import make_voc_superpixels
    from graph_hscn_tpu.models.gps import GPSModel
    from graph_hscn_tpu.parallel.hybrid import build_hybrid_split
    from graph_hscn_tpu.parallel.mesh import make_mesh
    from graph_hscn_tpu.parallel.sharded_gps import (
        init_sharded_gps_params, make_sharded_gps)
    from tests.test_sharded_gps import _map_params

    HID, HEADS, L = 16, 4, 2
    graphs = make_voc_superpixels(num_graphs=6, seed=31, mean_nodes=40)
    mesh = make_mesh(("data", "model"), (2, 4))
    plan, x, y, ok, meta = build_hybrid_split(graphs, 2, 4)
    plan["ok_blocks"] = ok
    params = init_sharded_gps_params(jax.random.PRNGKey(7), 14, HID, 21,
                                     L, HEADS)
    _, vg = make_sharded_gps(mesh, L, HEADS, axis="model",
                             shard_axes=("data", "model"),
                             grad_axes=("data", "model"))
    loss, grads = vg(params, x, plan["gid_blocks"], ok, plan, y)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()

    # Flax reference on a slotted pack of the same graphs.
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    budget = PadBudget.for_dataset(graphs, batch_size=len(graphs))
    b = pack_batch(graphs, budget, slot_nodes=slot)
    flax_model = GPSModel(num_features=14, hidden_channels=HID,
                          num_classes=21, num_layers=L, num_heads=HEADS,
                          dropout=0.0, readout="none")
    logits = flax_model.apply(_map_params(params, L), b, train=False)
    mask = jnp.asarray(b.node_mask)
    yy = jnp.asarray(b.node_y)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(yy * logp, axis=-1)
    ref_loss = float(jnp.sum(per * mask) / jnp.sum(mask))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)


def test_hybrid_eval_only(tmp_path):
    """--eval best on the hybrid 2-D mesh restores the sharded snapshot
    into the hybrid forward."""
    import numpy as np

    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_eval, run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 10},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50,
                     "checkpoint_dir": str(tmp_path / "ck_hy")},
        "mesh": {"axes": ["data", "model"], "shape": [2, 4],
                 "edge_partition": True},
    }
    run_experiment(parse_config(raw))
    results = run_eval(parse_config(raw), which="best")
    assert set(results) == {"val", "test"}
    assert np.isfinite(results["val"]["loss"])
