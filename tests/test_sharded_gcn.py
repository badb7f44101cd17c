"""Sharded edge-partitioned GCN vs the unsharded GCNConv stack: forward
and gradients must match on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_voc_superpixels
from graph_hscn_tpu.models.layers import GCNConv
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import (init_sharded_gcn_params,
                                                 make_sharded_gcn,
                                                 shard_node_blocks)


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

def _setup(D=8):
    graphs = make_voc_superpixels(num_graphs=4, seed=99, mean_nodes=300)
    budget = PadBudget.for_dataset(graphs, batch_size=4,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    return b, plan_np, n


def _unsharded_forward(params, batch):
    """Same math via the single-device GCNConv layers."""
    x = batch.node_feat
    n = batch.num_nodes_padded
    for i, layer in enumerate(params):
        conv = GCNConv(features=layer["kernel"].shape[1])
        vars_ = {"params": {"kernel": layer["kernel"],
                            "bias": layer["bias"]}}
        x = conv.apply(vars_, x, batch.senders, batch.receivers,
                       batch.edge_mask, num_nodes=n)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def test_sharded_forward_matches_unsharded():
    D = 8
    b, plan_np, n = _setup(D)
    mesh = make_mesh(("data",), (D,))
    dims = [14, 32, 21]
    params = init_sharded_gcn_params(jax.random.PRNGKey(0), dims)
    forward, _ = make_sharded_gcn(mesh, num_layers=len(dims) - 1)

    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    (x_blocks,) = shard_node_blocks(mesh, D, np.asarray(b.node_feat))
    out = np.asarray(forward(params, x_blocks, plan)).reshape(n, -1)

    ref = np.asarray(_unsharded_forward(params, b))
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], ref[mask], rtol=2e-4, atol=2e-4)


def test_sharded_gradients_match_unsharded():
    D = 8
    b, plan_np, n = _setup(D)
    mesh = make_mesh(("data",), (D,))
    dims = [14, 16, 21]
    params = init_sharded_gcn_params(jax.random.PRNGKey(1), dims)
    _, value_and_grad = make_sharded_gcn(mesh, num_layers=len(dims) - 1)

    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    node_ok = np.asarray(b.node_mask) & (np.asarray(b.node_y).sum(1) > 0)
    x_blocks, y_blocks, ok_blocks = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat), np.asarray(b.node_y),
        node_ok)
    loss, grads = value_and_grad(params, x_blocks, plan, y_blocks,
                                 ok_blocks)

    def ref_loss(params):
        logits = _unsharded_forward(params, b)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.sum(jnp.asarray(b.node_y) * logp, axis=-1)
        ok = jnp.asarray(node_ok, logits.dtype)
        return jnp.sum(per * ok) / ok.sum()

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-5)


def test_sharded_gcn_bf16_tracks_f32():
    """dtype=bfloat16: f32 master params, bf16 compute + halo payloads;
    forward tracks the f32 path and grads stay finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    from graph_hscn_tpu.data.synthetic import make_voc_superpixels
    from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
    from graph_hscn_tpu.parallel.mesh import make_mesh
    from graph_hscn_tpu.parallel.sharded_gcn import (
        init_sharded_gcn_params, make_sharded_gcn, shard_node_blocks)

    D = 8
    graphs = make_voc_superpixels(num_graphs=2, seed=5, mean_nodes=120)
    budget = PadBudget.for_dataset(graphs, batch_size=2,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_gcn_params(jax.random.PRNGKey(0), [14, 16, 21])
    fwd32, _ = make_sharded_gcn(mesh, num_layers=2)
    fwd16, vg16 = make_sharded_gcn(mesh, num_layers=2,
                                   dtype=jnp.bfloat16)
    xb, yb, okb = shard_node_blocks(mesh, D, np.asarray(b.node_feat),
                                    np.asarray(b.node_y),
                                    np.asarray(b.node_mask))
    out32 = np.asarray(fwd32(params, xb, plan))
    out16 = np.asarray(fwd16(params, xb, plan))
    assert out16.dtype == np.float32
    mask = np.asarray(b.node_mask).reshape(out32.shape[:2] + (1,) * 0)
    scale = np.abs(out32).max()
    assert np.abs(out16 - out32).max() <= 0.05 * scale

    loss, grads = vg16(params, xb, plan, yb, okb)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_edge_partition_pe_composition():
    """Frozen-random SignNet PE composes with the edge-partitioned path
    (features enriched before packing); the trainable-SignNet variant is
    refused explicitly instead of silently dropping PE."""
    import numpy as np
    import pytest

    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "pe": {"use": True, "max_freqs": 4, "phi_out_dim": 4,
               "hidden_channels": 8},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    result = run_experiment(parse_config(raw))
    assert result.epochs_run == 2
    assert np.isfinite(result.history[-1]["train_loss"])

    raw["compat"] = {"frozen_random_signnet": False}
    with pytest.raises(ValueError, match="frozen_random_signnet"):
        run_experiment(parse_config(raw))


def test_sharded_gin_matches_flax_and_cli():
    """Sharded GIN vs a stacked flax GINConv (ReLU between layers) with
    mapped weights, plus the CLI route."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    from graph_hscn_tpu.data.synthetic import make_voc_superpixels
    from graph_hscn_tpu.models.layers import GINConv
    from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
    from graph_hscn_tpu.parallel.mesh import make_mesh
    from graph_hscn_tpu.parallel.sharded_gcn import (
        init_sharded_gin_params, make_sharded_gin, shard_node_blocks)

    D = 8
    graphs = make_voc_superpixels(num_graphs=2, seed=15, mean_nodes=120)
    budget = PadBudget.for_dataset(graphs, batch_size=2,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    mesh = make_mesh(("data",), (D,))
    dims = [14, 16, 21]
    params = init_sharded_gin_params(jax.random.PRNGKey(1), dims)
    forward, _ = make_sharded_gin(mesh, num_layers=2)
    (xb,) = shard_node_blocks(mesh, D, np.asarray(b.node_feat))
    out = np.asarray(forward(params, xb, plan)).reshape(n, -1)

    x = jnp.asarray(b.node_feat)
    for i, layer in enumerate(params):
        conv = GINConv(features=dims[i + 1])
        x = conv.apply({"params": {"Dense_0": {"kernel": layer["w1"],
                                               "bias": layer["b1"]},
                                   "Dense_1": {"kernel": layer["w2"],
                                               "bias": layer["b2"]}}},
                       x, b.senders, b.receivers, b.edge_mask,
                       num_nodes=n)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    ref = np.asarray(x)
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], ref[mask], rtol=2e-4, atol=2e-4)

    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment
    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "mp": {"conv_type": "gin", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gin", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    result = run_experiment(parse_config(raw))
    assert result.epochs_run == 2
    assert np.isfinite(result.history[-1]["train_loss"])


def test_edge_partition_auto_resume(tmp_path):
    """fit_edge_partitioned resumes from the latest snapshot: a second
    invocation with more epochs continues instead of restarting."""
    import numpy as np

    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 3, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50,
                     "checkpoint_dir": str(tmp_path / "ck"),
                     "checkpoint_every": 1},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    r1 = run_experiment(parse_config(raw))
    assert r1.epochs_run == 3
    raw["training"]["max_epochs"] = 5
    r2 = run_experiment(parse_config(raw))
    epochs = [h["epoch"] for h in r2.history]
    assert min(epochs) > 0          # continued, not restarted
    assert max(epochs) == 4
    assert np.isfinite(r2.history[-1]["train_loss"])
