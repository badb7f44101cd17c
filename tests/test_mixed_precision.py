"""Mixed precision (runtime.compute_dtype: bfloat16).

Contract: params are stored and updated in float32, model-internal compute
(matmuls, message passing, attention) runs in bfloat16, and logits come
back as float32 so losses/metrics/optimizer are full precision.  bf16
forward must track the f32 forward closely on molecular-scale graphs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.config.config import HSCNConfig, MPNNConfig
from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.hscn import build_hscn
from graph_hscn_tpu.models.layers import resolve_dtype
from graph_hscn_tpu.models.mpnn import build_mpnn


def _batch(with_cluster=False, num_graphs=8, seed=0):
    graphs = make_peptides_func(num_graphs=num_graphs, seed=seed,
                                mean_nodes=40)
    if with_cluster:
        rng = np.random.default_rng(seed)
        graphs = [g.replace(cluster=rng.integers(0, 4, size=g.num_nodes)
                            .astype(np.int32)) for g in graphs]
    budget = PadBudget.for_dataset(graphs, batch_size=num_graphs)
    return pack_batch(graphs, budget)


def test_resolve_dtype():
    assert resolve_dtype("float32") is None
    assert resolve_dtype(None) is None
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    with pytest.raises(ValueError):
        resolve_dtype("float16")


@pytest.mark.parametrize("conv", ["gcn", "gat", "gin", "gatedgcn"])
def test_mpnn_bf16_tracks_f32(conv):
    batch = _batch()
    cfg = MPNNConfig(conv_type=conv, activation="relu", hidden_channels=32,
                     num_layers=3, dropout=0.0)
    m32 = build_mpnn(cfg, batch.node_feat.shape[-1], 10)
    m16 = build_mpnn(cfg, batch.node_feat.shape[-1], 10,
                     dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    # Same param tree applies to both precisions (params stay f32).
    p16 = m16.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(p16))
    y32 = m32.apply({"params": params}, batch, train=False)
    y16 = m16.apply({"params": params}, batch, train=False)
    assert y16.dtype == jnp.float32, "logits must come back f32"
    scale = float(np.abs(np.asarray(y32)).mean()) + 1e-6
    err = float(np.abs(np.asarray(y16) - np.asarray(y32)).mean()) / scale
    assert err < 0.08, f"bf16 {conv} diverges from f32: rel err {err:.3f}"


def test_gps_bf16_tracks_f32():
    """GPS attention under bf16 compute: f32 softmax keeps it close."""
    graphs = make_peptides_func(num_graphs=8, seed=0, mean_nodes=40)
    budget = PadBudget.for_dataset(graphs, batch_size=8)
    batch = pack_batch(graphs, budget, slot_nodes=128)
    cfg = MPNNConfig(conv_type="gps", activation="relu",
                     hidden_channels=32, num_layers=2, num_heads=4,
                     dropout=0.0)
    m32 = build_mpnn(cfg, batch.node_feat.shape[-1], 10)
    m16 = build_mpnn(cfg, batch.node_feat.shape[-1], 10,
                     dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    p16 = m16.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(p16))
    y32 = m32.apply({"params": params}, batch, train=False)
    y16 = m16.apply({"params": params}, batch, train=False)
    assert y16.dtype == jnp.float32
    scale = float(np.abs(np.asarray(y32)).mean()) + 1e-6
    err = float(np.abs(np.asarray(y16) - np.asarray(y32)).mean()) / scale
    assert err < 0.08, f"bf16 gps diverges from f32: rel err {err:.3f}"


def test_hscn_bf16_tracks_f32():
    batch = _batch(with_cluster=True)
    cfg = HSCNConfig(activation="relu", hidden_channels=32, num_layers=2,
                     num_clusters=4)
    m32 = build_hscn(cfg, num_classes=10)
    m16 = build_hscn(cfg, num_classes=10, dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    y32 = m32.apply({"params": params}, batch, train=False)
    y16 = m16.apply({"params": params}, batch, train=False)
    assert y16.dtype == jnp.float32
    scale = float(np.abs(np.asarray(y32)).mean()) + 1e-6
    err = float(np.abs(np.asarray(y16) - np.asarray(y32)).mean()) / scale
    assert err < 0.08, f"bf16 HSCN diverges from f32: rel err {err:.3f}"


def test_bf16_grads_are_f32_and_finite():
    batch = _batch()
    cfg = MPNNConfig(conv_type="gcn", activation="relu", hidden_channels=16,
                     num_layers=3, dropout=0.0)
    model = build_mpnn(cfg, batch.node_feat.shape[-1], 10,
                       dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), batch, train=False)["params"]

    def loss_fn(p):
        y = model.apply({"params": p}, batch, train=False)
        return jnp.mean(y ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_runner_bf16_trains():
    """compute_dtype: bfloat16 through the config-driven entry point."""
    from graph_hscn_tpu.config.config import (DataConfig, ExperimentConfig,
                                              OptimConfig, RuntimeConfig,
                                              TrainingConfig)
    from graph_hscn_tpu.runner import run_experiment

    cfg = ExperimentConfig(
        data=DataConfig(dataset_name="peptides_func", batch_size=16,
                        num_graphs=48),
        mpnn=MPNNConfig(conv_type="gcn", activation="relu",
                        hidden_channels=16, num_layers=2, dropout=0.0),
        optim=OptimConfig(optim_type="adamW", lr=0.005, weight_decay=5e-4),
        training=TrainingConfig(model_type="gcn", loss_fn="cross_entropy",
                                metric="ap", epochs=4, eval_period=2,
                                patience=50, min_delta=0.0,
                                use_wandb=False),
        runtime=RuntimeConfig(compute_dtype="bfloat16"),
    )
    result = run_experiment(cfg)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert np.isfinite(result.history[-1]["train_loss"])
