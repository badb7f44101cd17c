"""Regularization on the edge-partitioned paths (VERDICT round-2 item 4):
dropout is IMPLEMENTED for sharded gcn/gin/gat (per-device PRNG), and
norm flags / unsupported-family dropout are refused loudly instead of
silently ignored."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_voc_superpixels
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import (init_sharded_gcn_params,
                                                 make_sharded_gcn,
                                                 shard_node_blocks)

D = 8


@pytest.fixture(scope="module")
def setup():
    graphs = make_voc_superpixels(num_graphs=4, seed=7, mean_nodes=200)
    budget = PadBudget.for_dataset(graphs, batch_size=4,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    mesh = make_mesh(("data",), (D,))
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    xb, yb, okb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat), np.asarray(b.node_y),
        np.asarray(b.node_mask))
    return mesh, plan, xb, yb, okb


def test_sharded_gcn_dropout_trains_stochastic_eval_deterministic(setup):
    mesh, plan, xb, yb, okb = setup
    dims = [14, 32, 21]
    params = init_sharded_gcn_params(jax.random.PRNGKey(0), dims)
    fwd, vg = make_sharded_gcn(mesh, num_layers=2, dropout=0.5)

    l1, g1 = vg(params, xb, plan, yb, okb, key=jax.random.PRNGKey(1))
    l2, g2 = vg(params, xb, plan, yb, okb, key=jax.random.PRNGKey(2))
    l1b, _ = vg(params, xb, plan, yb, okb, key=jax.random.PRNGKey(1))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)          # different masks, different loss
    assert float(l1) == float(l1b)         # reproducible per step key
    for g in jax.tree_util.tree_leaves(g1):
        assert np.all(np.isfinite(np.asarray(g)))

    # Eval forward carries no key: deterministic, dropout off.
    o1 = np.asarray(fwd(params, xb, plan))
    o2 = np.asarray(fwd(params, xb, plan))
    np.testing.assert_array_equal(o1, o2)

    # dropout=0 build matches the no-dropout build exactly.
    _, vg0 = make_sharded_gcn(mesh, num_layers=2, dropout=0.0)
    _, vg_ref = make_sharded_gcn(mesh, num_layers=2)
    la, _ = vg0(params, xb, plan, yb, okb)
    lb, _ = vg_ref(params, xb, plan, yb, okb)
    assert float(la) == float(lb)


def test_per_device_masks_differ(setup):
    """Devices fold their mesh index into the step key: the SAME step key
    must yield DIFFERENT dropout masks on different devices (no lockstep
    masks under data sharding).  Asserted directly on _device_key +
    _dropout inside a shard_map over the mesh."""
    from jax.sharding import PartitionSpec as P

    from graph_hscn_tpu.parallel.sharded_gcn import _device_key, _dropout

    mesh, *_ = setup

    def per_device(key):
        dk = _device_key(key[0], "data")
        kept = _dropout(jnp.ones((4, 64)), dk, 0, 0.5)
        return kept[None]

    run = jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P("data"),), out_specs=P("data"),
        check_vma=False))
    keys = jnp.broadcast_to(jax.random.PRNGKey(3), (D, 2))
    masks = np.asarray(run(keys))       # [D, 4, 64]
    for d in range(1, D):
        assert not np.array_equal(masks[0], masks[d]), d
    # Same key, second run: bitwise-identical masks (reproducibility).
    np.testing.assert_array_equal(masks, np.asarray(run(keys)))


def _run_cfg(extra_mp, tmp_path):
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "mp": dict({"conv_type": "gcn", "activation": "relu",
                    "hidden_channels": 8, "num_layers": 2,
                    "dropout": 0.0}, **extra_mp),
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    return run_experiment(parse_config(raw))


def test_cli_dropout_trains(tmp_path):
    r = _run_cfg({"dropout": 0.3}, tmp_path)
    assert np.isfinite(r.history[-1]["train_loss"])


def test_norm_flags_refused(tmp_path):
    with pytest.raises(ValueError, match="norm"):
        _run_cfg({"use_layer_norm": True}, tmp_path)


def test_cli_gps_dropout_trains(tmp_path):
    """Sharded GPS dropout (VERDICT round-3 item 5): the three GPSLayer
    dropout sites run with per-device folded keys."""
    r = _run_cfg({"conv_type": "gps", "dropout": 0.2, "num_heads": 2,
                  "hidden_channels": 8}, tmp_path)
    assert np.isfinite(r.history[-1]["train_loss"])


def test_cli_gatedgcn_dropout_trains(tmp_path):
    r = _run_cfg({"conv_type": "gatedgcn", "dropout": 0.3}, tmp_path)
    assert np.isfinite(r.history[-1]["train_loss"])


def test_dropout_without_key_raises(setup):
    """dropout > 0 with no per-step key must raise, not silently reuse a
    fixed mask every step (round-3 advisor finding)."""
    mesh, plan, xb, yb, okb = setup
    params = init_sharded_gcn_params(jax.random.PRNGKey(0), [14, 32, 21])
    _, vg = make_sharded_gcn(mesh, num_layers=2, dropout=0.5)
    with pytest.raises(ValueError, match="PRNG"):
        vg(params, xb, plan, yb, okb)
