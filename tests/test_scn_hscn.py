"""SCN clustering + HSCN pipeline tests: mincut loss math, clustering
convergence, virtual-node construction, end-to-end HSCN training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.config.config import (DataConfig, HSCNConfig, OptimConfig,
                                          TrainingConfig)
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.models.hscn import (_vv_adjacency, build_hscn,
                                        virtual_node_features)
from graph_hscn_tpu.models.scn import build_scn
from graph_hscn_tpu.ops.dense import mincut_pool
from graph_hscn_tpu.train.clustering import train_clustering
from graph_hscn_tpu.utils.logger import Logger


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

def test_mincut_loss_values():
    """Two disconnected cliques, perfect 2-way assignment: mincut loss -> -1
    (all edges intra-cluster), ortho loss small."""
    n, half = 8, 4
    adj = np.zeros((1, n, n), np.float32)
    adj[0, :half, :half] = 1 - np.eye(half)
    adj[0, half:, half:] = 1 - np.eye(half)
    s_logits = np.zeros((1, n, 2), np.float32)
    s_logits[0, :half, 0] = 10.0
    s_logits[0, half:, 1] = 10.0
    x = np.random.default_rng(0).normal(size=(1, n, 3)).astype(np.float32)
    x_pool, adj_pool, mc, o = mincut_pool(jnp.array(x), jnp.array(adj),
                                          jnp.array(s_logits))
    assert float(mc) < -0.99          # cut is perfect
    assert float(o) < 0.05            # balanced clusters -> near-orthogonal
    # Pooled features = sums of member features.
    # softmax(10) ~ 0.99995, so member weights are not exactly 1.
    np.testing.assert_allclose(np.asarray(x_pool)[0, 0], x[0, :half].sum(0),
                               rtol=1e-3)
    # Pooled adjacency diagonal zeroed.
    assert np.abs(np.asarray(adj_pool)[0, 0, 0]) < 1e-6


def test_mincut_bad_assignment_is_worse():
    n, half = 8, 4
    adj = np.zeros((1, n, n), np.float32)
    adj[0, :half, :half] = 1 - np.eye(half)
    adj[0, half:, half:] = 1 - np.eye(half)
    x = np.zeros((1, n, 3), np.float32)
    good = np.zeros((1, n, 2), np.float32)
    good[0, :half, 0] = 10
    good[0, half:, 1] = 10
    # Split each clique across clusters.
    bad = np.zeros((1, n, 2), np.float32)
    bad[0, ::2, 0] = 10
    bad[0, 1::2, 1] = 10
    _, _, mc_good, _ = mincut_pool(jnp.array(x), jnp.array(adj),
                                   jnp.array(good))
    _, _, mc_bad, _ = mincut_pool(jnp.array(x), jnp.array(adj),
                                  jnp.array(bad))
    assert float(mc_good) < float(mc_bad)


def test_vv_adjacency_patterns():
    # 1 graph, K=4, 3 active clusters (0, 1, 3).
    act = jnp.array([True, True, False, True])
    a_clique = np.asarray(_vv_adjacency(act, 1, 4, "clique", jnp.float32))[0]
    # Active pairs fully connected, no self loops, inactive row/col zero.
    assert a_clique[0, 1] == 1 and a_clique[1, 0] == 1 and a_clique[3, 0] == 1
    assert a_clique[0, 0] == 0 and a_clique[2, :].sum() == 0

    a_tri = np.asarray(_vv_adjacency(act, 1, 4, "triangular",
                                     jnp.float32))[0]
    # Compacted positions: slot0->0, slot1->1, slot3->2; num_active=3.
    # Pattern p_src + p_dst < 3: (0,0),(0,1),(0,2),(1,0),(1,1),(2,0).
    assert a_tri[0, 0] == 1           # (p0, p0): 0+0<3, self-loop included
    assert a_tri[1, 1] == 1           # 1+1<3
    assert a_tri[3, 3] == 0           # 2+2 >= 3
    assert a_tri[3, 0] == 1 and a_tri[0, 3] == 1
    assert a_tri[1, 3] == 0 and a_tri[3, 1] == 0  # 1+2 >= 3
    assert a_tri[2, :].sum() == 0     # inactive


def test_virtual_node_features_mean():
    data_cfg = DataConfig(dataset_name="peptides_func", batch_size=4,
                          num_graphs=8)
    dm = DataModule.from_config(data_cfg)
    rng = np.random.default_rng(0)
    dm.graphs = [g.replace(cluster=rng.integers(0, 3, size=g.num_nodes)
                           .astype(np.int32)) for g in dm.graphs]
    batch = dm.example_batch()
    K = 4
    x_v, v_active, vid = virtual_node_features(batch, K)
    x_v = np.asarray(x_v)
    g0 = dm.split("train")[0]
    for k in np.unique(g0.cluster):
        members = g0.x[g0.cluster == k]
        np.testing.assert_allclose(x_v[0 * K + k], members.mean(0),
                                   rtol=1e-5, atol=1e-5)
        assert bool(v_active[0 * K + k])
    # Empty cluster slot inactive.
    empty = set(range(K)) - set(np.unique(g0.cluster).tolist())
    for k in empty:
        assert not bool(v_active[0 * K + k])


def test_clustering_loss_decreases():
    data_cfg = DataConfig(dataset_name="peptides_func", batch_size=8,
                          num_graphs=32)
    dm = DataModule.from_config(data_cfg)
    hscn_cfg = HSCNConfig(activation="relu", num_clusters=4,
                          cluster_epochs=4, mp_units=[16])
    optim_cfg = OptimConfig(optim_type="adam", lr=0.005, weight_decay=0.0)
    scn = build_scn(hscn_cfg, dm.num_features, max_nodes=512)
    logger = Logger(metric_name="ap")
    clusters = train_clustering(logger, dm, scn, hscn_cfg, optim_cfg)
    assert len(clusters) == 32
    for g, c in zip(dm.graphs, clusters):
        assert c.shape == (g.num_nodes,)
        assert c.min() >= 0 and c.max() < 4
    # Clustering should use more than one cluster on most graphs.
    multi = sum(len(np.unique(c)) > 1 for c in clusters)
    assert multi > 16


def test_hscn_relation_conv_types():
    """ll/vv conv types from config are honored (GAT variants)."""
    data_cfg = DataConfig(dataset_name="peptides_func", batch_size=4,
                          num_graphs=12)
    dm = DataModule.from_config(data_cfg)
    rng = np.random.default_rng(3)
    dm.graphs = [g.replace(cluster=rng.integers(0, 4, size=g.num_nodes)
                           .astype(np.int32)) for g in dm.graphs]
    cfg = HSCNConfig(activation="relu", num_clusters=4, num_layers=2,
                     hidden_channels=8, ll_conv_type="GAT",
                     vv_conv_type="GAT")
    model = build_hscn(cfg, dm.num_classes)
    batch = dm.example_batch()
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = np.asarray(model.apply(params, batch, train=False))
    assert np.isfinite(out).all()
    # Param structure contains GAT (att_src) for both relations.
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = "/".join(str(k) for k, _ in flat)
    assert "att_src" in names
    assert "DenseGAT" in names


def test_hscn_end_to_end():
    data_cfg = DataConfig(dataset_name="peptides_func", batch_size=8,
                          num_graphs=48)
    dm = DataModule.from_config(data_cfg)
    rng = np.random.default_rng(1)
    dm.graphs = [g.replace(cluster=rng.integers(0, 4, size=g.num_nodes)
                           .astype(np.int32)) for g in dm.graphs]
    hscn_cfg = HSCNConfig(activation="relu", num_clusters=4, num_layers=2,
                          hidden_channels=16)
    model = build_hscn(hscn_cfg, dm.num_classes)
    from graph_hscn_tpu.train.loop import fit
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.005, weight_decay=5e-4)
    training_cfg = TrainingConfig(model_type="hscn", loss_fn="cross_entropy",
                                  metric="ap", epochs=6, eval_period=3,
                                  patience=50, min_delta=0.0)
    logger = Logger(metric_name="ap")
    result = fit(model, lambda epoch: dm.train_batches(epoch_seed=epoch),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, logger)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert np.isfinite(result.history[-1]["train_loss"])


def test_hscn_multi_head():
    """num_heads > 1 on the GAT relation slots: output keeps hidden width
    (H heads of hidden/H concatenated), grads finite, and the attention
    params carry the multi-head shapes."""
    data_cfg = DataConfig(dataset_name="peptides_func", batch_size=4,
                          num_graphs=12)
    dm = DataModule.from_config(data_cfg)
    rng = np.random.default_rng(7)
    dm.graphs = [g.replace(cluster=rng.integers(0, 4, size=g.num_nodes)
                           .astype(np.int32)) for g in dm.graphs]
    cfg = HSCNConfig(activation="relu", num_clusters=4, num_layers=2,
                     hidden_channels=16, num_heads=4, ll_conv_type="GAT",
                     vv_conv_type="GAT")
    model = build_hscn(cfg, dm.num_classes)
    batch = dm.example_batch()
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    # lv GAT attention params are [1, H, C] with H=4, C=hidden/4.
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    att_shapes = {tuple(v.shape) for k, v in flat
                  if "att_src" in "/".join(str(p) for p in k)}
    assert (1, 4, 4) in att_shapes          # GATConv slots
    assert (1, 1, 4, 4) in att_shapes       # DenseGAT vv slot
    out = np.asarray(model.apply(params, batch, train=False))
    assert out.shape[-1] == dm.num_classes
    assert np.isfinite(out).all()

    def loss(p):
        o = model.apply(p, batch, train=False)
        return jnp.sum(jnp.where(batch.graph_mask[:, None], o, 0.0) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # At least one attention grad is non-zero (heads actually in the path).
    att_grads = [v for k, v in jax.tree_util.tree_flatten_with_path(grads)[0]
                 if "att_src" in "/".join(str(p) for p in k)]
    assert any(float(jnp.abs(g).sum()) > 0 for g in att_grads)


def test_hscn_heads_validation():
    import pytest
    with pytest.raises(ValueError):
        HSCNConfig(hidden_channels=10, num_heads=4)
