"""Sharded SCN (edge-partitioned MinCUT clustering) vs the flax SCN with
mapped weights on the 8-device CPU mesh: losses, gradients (the
psum-transpose convention), partition invariance, and the CLI-reachable
giant-graph HSCN pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_voc_superpixels
from graph_hscn_tpu.models.scn import SCN
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import shard_node_blocks
from graph_hscn_tpu.parallel.sharded_scn import (init_sharded_scn_params,
                                                 make_sharded_scn)

D = 8
K = 4
MP_UNITS = [16, 16]


def _setup(num_devices=D):
    graphs = make_voc_superpixels(num_graphs=1, seed=41, mean_nodes=400)
    budget = PadBudget.for_dataset(graphs, batch_size=1,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    snd = np.asarray(b.senders)
    em = np.asarray(b.edge_mask)
    outdeg = np.bincount(snd[em], minlength=n).astype(np.float32)
    plan_np = plan_halo_exchange(snd, np.asarray(b.receivers), em, n,
                                 num_devices)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    return b, plan, n, outdeg


def _map_params(sharded_params):
    """Sharded param pytree -> flax SCN variables dict."""
    p = {}
    for i, layer in enumerate(sharded_params["layers"]):
        p[f"GraphConv_{i}"] = {"kernel_rel": layer["kernel_rel"],
                               "kernel_root": layer["kernel_root"],
                               "bias": layer["bias"]}
    p["Dense_0"] = {"kernel": sharded_params["head"]["kernel"],
                    "bias": sharded_params["head"]["bias"]}
    return {"params": p}


def _flax_scn(n):
    return SCN(mp_units=MP_UNITS, mp_act="relu", num_clusters=K,
               max_nodes=n)


def test_sharded_scn_losses_match_flax():
    b, plan, n, outdeg = _setup()
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_scn_params(jax.random.PRNGKey(5), 14, MP_UNITS, K)
    losses, _, assign = make_sharded_scn(mesh, K)
    xb, mb, db = shard_node_blocks(mesh, D, np.asarray(b.node_feat),
                                   np.asarray(b.node_mask), outdeg)
    mc, o = losses(params, xb, mb, db, plan)

    scn = _flax_scn(n)
    s_ref, mc_ref, o_ref = scn.apply(_map_params(params), b, train=False)
    np.testing.assert_allclose(float(mc), float(mc_ref), rtol=1e-4)
    np.testing.assert_allclose(float(o), float(o_ref), rtol=1e-4)

    # Assignments agree with the flax argmax on real nodes.
    cb = np.asarray(assign(params, xb, mb, db, plan)).reshape(n)
    ref_ids = np.asarray(jnp.argmax(s_ref, -1))
    mask = np.asarray(b.node_mask)
    np.testing.assert_array_equal(cb[mask], ref_ids[mask])


def test_sharded_scn_grads_match_flax():
    """The MinCUT loss is a nonlinear function of psum'd contractions;
    per-device value_and_grad already returns the full global gradient
    (no extra grad psum).  This asserts exact agreement with jax.grad of
    the flax SCN loss under mapped weights."""
    b, plan, n, outdeg = _setup()
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_scn_params(jax.random.PRNGKey(6), 14, MP_UNITS, K)
    _, vg, _ = make_sharded_scn(mesh, K)
    xb, mb, db = shard_node_blocks(mesh, D, np.asarray(b.node_feat),
                                   np.asarray(b.node_mask), outdeg)
    loss, grads = vg(params, xb, mb, db, plan)

    scn = _flax_scn(n)

    def flax_loss(p):
        _, mc, o = scn.apply({"params": p}, b, train=False)
        return mc + o

    ref_grads = jax.grad(flax_loss)(_map_params(params)["params"])
    np.testing.assert_allclose(float(loss),
                               float(flax_loss(_map_params(params)
                                               ["params"])), rtol=1e-4)
    for i, layer in enumerate(grads["layers"]):
        for k in ("kernel_rel", "kernel_root", "bias"):
            np.testing.assert_allclose(
                np.asarray(layer[k]),
                np.asarray(ref_grads[f"GraphConv_{i}"][k]),
                rtol=5e-3, atol=1e-5, err_msg=f"layer {i} {k}")
    np.testing.assert_allclose(np.asarray(grads["head"]["kernel"]),
                               np.asarray(ref_grads["Dense_0"]["kernel"]),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["head"]["bias"]),
                               np.asarray(ref_grads["Dense_0"]["bias"]),
                               rtol=5e-3, atol=1e-5)


def test_sharded_scn_partition_invariant():
    b, _, n, outdeg = _setup()
    params = init_sharded_scn_params(jax.random.PRNGKey(7), 14, MP_UNITS, K)
    out = []
    for d in (1, D):
        mesh = make_mesh(("data",), (d,), devices=jax.devices()[:d])
        plan_np = plan_halo_exchange(np.asarray(b.senders),
                                     np.asarray(b.receivers),
                                     np.asarray(b.edge_mask), n, d)
        plan = {k: jnp.asarray(v) for k, v in plan_np.items()
                if k not in ("block_size", "halo_width")}
        _, vg, _ = make_sharded_scn(mesh, K)
        xb, mb, db = shard_node_blocks(mesh, d, np.asarray(b.node_feat),
                                       np.asarray(b.node_mask), outdeg)
        loss, grads = vg(params, xb, mb, db, plan)
        out.append((float(loss),
                    float(jnp.linalg.norm(grads["head"]["kernel"]))))
    np.testing.assert_allclose(out[0][0], out[1][0], rtol=5e-5)
    np.testing.assert_allclose(out[0][1], out[1][1], rtol=1e-4)


def test_runner_edge_partitioned_hscn():
    """hscn: + mesh.edge_partition routes through the full sharded
    pipeline (sharded SCN clustering -> sharded HSCN training)."""
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 10},
        "hscn": {"activation": "relu", "hidden_channels": 8,
                 "num_layers": 2, "num_clusters": 4, "cluster_epochs": 2,
                 "mp_units": [8]},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "hscn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 3, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg)
    assert result.epochs_run == 3
    assert np.isfinite(result.history[-1]["train_loss"])
    assert "validation_perf" in result.history[-1]


def test_eval_only_edge_partitioned(tmp_path):
    """--eval best works on the sharded paths: the snapshot (a sharded
    param pytree, not flax variables) restores into the shard_map forward
    for both the HSCN pipeline and the plain sharded GCN."""
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_eval, run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 10},
        "hscn": {"activation": "relu", "hidden_channels": 8,
                 "num_layers": 2, "num_clusters": 4, "cluster_epochs": 1,
                 "mp_units": [8]},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "hscn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50,
                     "checkpoint_dir": str(tmp_path / "ck_hscn")},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    run_experiment(parse_config(raw))
    results = run_eval(parse_config(raw), which="best")
    assert set(results) == {"val", "test"}
    assert np.isfinite(results["val"]["loss"])
    assert "f1" in results["test"]

    raw.pop("hscn")
    raw["mp"] = {"conv_type": "gcn", "activation": "relu",
                 "hidden_channels": 8, "num_layers": 2, "dropout": 0.0}
    raw["training"]["model_type"] = "gcn"
    raw["training"]["checkpoint_dir"] = str(tmp_path / "ck_gcn")
    run_experiment(parse_config(raw))
    results = run_eval(parse_config(raw), which="best")
    assert np.isfinite(results["val"]["loss"])
