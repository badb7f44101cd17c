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


def _sharded_setup(D=8):
    from graph_hscn_tpu.data.synthetic import make_voc_superpixels
    from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
    from graph_hscn_tpu.parallel.mesh import make_mesh
    from graph_hscn_tpu.parallel.sharded_gcn import shard_node_blocks
    graphs = make_voc_superpixels(num_graphs=4, seed=9, mean_nodes=200)
    budget = PadBudget.for_dataset(graphs, batch_size=4,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    mesh = make_mesh(("data",), (D,))
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width",
                         "eidx_loc", "eidx_hal")}
    xb, yb, okb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat), np.asarray(b.node_y),
        np.asarray(b.node_mask))
    return mesh, plan, xb, yb, okb, n, b


def test_sharded_gat_bf16_tracks_f32():
    """Sharded GAT mixed precision (VERDICT round-3 item 3: previously
    silently downgraded to f32): bf16 build runs, returns f32 logits, and
    tracks the f32 build loosely; softmax stays f32-stable."""
    from graph_hscn_tpu.parallel.sharded_gcn import (init_sharded_gat_params,
                                                     make_sharded_gat)
    mesh, plan, xb, yb, okb, n, b = _sharded_setup()
    params = init_sharded_gat_params(jax.random.PRNGKey(0), [14, 32, 21],
                                     heads=2)
    fwd32, vg32 = make_sharded_gat(mesh, num_layers=2)
    fwd16, vg16 = make_sharded_gat(mesh, num_layers=2, dtype=jnp.bfloat16)
    o32 = np.asarray(fwd32(params, xb, plan))
    o16 = np.asarray(fwd16(params, xb, plan))
    assert o16.dtype == np.float32
    m = np.asarray(b.node_mask)
    np.testing.assert_allclose(o16.reshape(n, -1)[m],
                               o32.reshape(n, -1)[m], rtol=0.1, atol=0.15)
    l32, g32 = vg32(params, xb, plan, yb, okb)
    l16, g16 = vg16(params, xb, plan, yb, okb)
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)
    for a, c in zip(jax.tree_util.tree_leaves(g16),
                    jax.tree_util.tree_leaves(g32)):
        assert np.asarray(a).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(a)))


def test_sharded_gatedgcn_bf16_tracks_f32():
    """Sharded GatedGCN mixed precision: bf16 streams + f32 LN stats and
    gate normalization track the f32 build loosely."""
    from graph_hscn_tpu.parallel.sharded_gatedgcn import (
        init_sharded_gatedgcn_params, make_sharded_gatedgcn)
    mesh, plan, xb, yb, okb, n, b = _sharded_setup()
    params = init_sharded_gatedgcn_params(jax.random.PRNGKey(1), 14, None,
                                          16, 21, 2)
    fw32, vg32 = make_sharded_gatedgcn(mesh, 2)
    fw16, vg16 = make_sharded_gatedgcn(mesh, 2, dtype=jnp.bfloat16)
    o32 = np.asarray(fw32(params, xb, None, None, okb, plan))
    o16 = np.asarray(fw16(params, xb, None, None, okb, plan))
    assert o16.dtype == np.float32
    m = np.asarray(b.node_mask)
    np.testing.assert_allclose(o16.reshape(n, -1)[m],
                               o32.reshape(n, -1)[m], rtol=0.15, atol=0.25)
    l32, _ = vg32(params, xb, None, None, okb, plan, yb)
    l16, g16 = vg16(params, xb, None, None, okb, plan, yb)
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)
    for a in jax.tree_util.tree_leaves(g16):
        assert np.asarray(a).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(a)))


def test_runner_sharded_gat_bf16_not_ignored():
    """CLI: compute_dtype bfloat16 on an edge-partitioned GAT config must
    TRAIN in bf16 (no silent downgrade, no refusal)."""
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
        "runtime": {"compute_dtype": "bfloat16"},
    }
    r = run_experiment(parse_config(raw))
    assert np.isfinite(r.history[-1]["train_loss"])


def test_hscn_edge_partitioned_bf16_trains():
    """compute_dtype bfloat16 on the sharded HSCN pipeline trains (bf16
    streams; MinCUT contractions / lv softmax statistics stay f32)."""
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment
    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "hscn": {"activation": "relu", "hidden_channels": 8,
                 "num_layers": 2, "num_clusters": 4, "cluster_epochs": 1,
                 "mp_units": [8]},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "hscn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
        "runtime": {"compute_dtype": "bfloat16"},
    }
    r = run_experiment(parse_config(raw))
    assert np.isfinite(r.history[-1]["train_loss"])


def test_sharded_scn_hscn_bf16_track_f32():
    """bf16 sharded SCN losses/grads and HSCN forward/loss track the f32
    builds loosely on the 8-device mesh."""
    from graph_hscn_tpu.parallel.sharded_hscn import (
        init_sharded_hscn_params, make_sharded_hscn)
    from graph_hscn_tpu.parallel.sharded_scn import (init_sharded_scn_params,
                                                     make_sharded_scn)
    mesh, plan, xb, yb, okb, n, b = _sharded_setup()
    D = 8
    K = 4
    snd = np.asarray(b.senders)
    em = np.asarray(b.edge_mask)
    outdeg = np.bincount(snd[em], minlength=n).astype(np.float32)
    from graph_hscn_tpu.parallel.sharded_gcn import shard_node_blocks
    (db,) = shard_node_blocks(mesh, D, outdeg)

    scn_params = init_sharded_scn_params(jax.random.PRNGKey(2), 14,
                                         [32], K)
    losses32, vg32, _ = make_sharded_scn(mesh, K)
    losses16, vg16, _ = make_sharded_scn(mesh, K, dtype=jnp.bfloat16)
    mc32, o32 = losses32(scn_params, xb, okb, db, plan)
    mc16, o16 = losses16(scn_params, xb, okb, db, plan)
    np.testing.assert_allclose(float(mc16), float(mc32), atol=0.05)
    np.testing.assert_allclose(float(o16), float(o32), atol=0.05)
    l16, g16 = vg16(scn_params, xb, okb, db, plan)
    assert np.isfinite(float(l16))
    for g in jax.tree_util.tree_leaves(g16):
        assert np.asarray(g).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(g)))

    rng = np.random.default_rng(0)
    clust = rng.integers(0, K, size=n).astype(np.int32)
    (cb,) = shard_node_blocks(mesh, D, clust)
    hp = init_sharded_hscn_params(jax.random.PRNGKey(3), 14, 16, 21, 2)
    fw32, hvg32 = make_sharded_hscn(mesh, K)
    fw16, hvg16 = make_sharded_hscn(mesh, K, dtype=jnp.bfloat16)
    o_32 = np.asarray(fw32(hp, xb, okb, cb, plan)).reshape(n, -1)
    o_16 = np.asarray(fw16(hp, xb, okb, cb, plan)).reshape(n, -1)
    assert o_16.dtype == np.float32
    m = np.asarray(b.node_mask)
    np.testing.assert_allclose(o_16[m], o_32[m], rtol=0.15, atol=0.2)
    hl32, _ = hvg32(hp, xb, okb, cb, plan, yb, okb)
    hl16, hg16 = hvg16(hp, xb, okb, cb, plan, yb, okb)
    np.testing.assert_allclose(float(hl16), float(hl32), rtol=0.05)
    for g in jax.tree_util.tree_leaves(hg16):
        assert np.asarray(g).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(g)))


def test_sharded_hscn_bf16_with_virtual_feedback():
    """bf16 + virtual_feedback compose: the vl projection runs in the
    compute dtype, the forward stays f32 at the logits, tracks the f32
    build, and psum'd grads (incl. the vl leaves) are finite f32."""
    from graph_hscn_tpu.parallel.sharded_gcn import shard_node_blocks
    from graph_hscn_tpu.parallel.sharded_hscn import (
        init_sharded_hscn_params, make_sharded_hscn)
    mesh, plan, xb, yb, okb, n, b = _sharded_setup()
    D, K = 8, 4
    rng = np.random.default_rng(1)
    clust = rng.integers(0, K, size=n).astype(np.int32)
    (cb,) = shard_node_blocks(mesh, D, clust)
    hp = init_sharded_hscn_params(jax.random.PRNGKey(4), 14, 16, 21, 2,
                                  virtual_feedback=True)
    for layer in hp["layers"]:    # zero-init -> fill to exercise the path
        layer["vl"]["kernel"] = jnp.asarray(
            rng.normal(size=layer["vl"]["kernel"].shape)
            .astype(np.float32) * 0.2)
    fw32, vg32 = make_sharded_hscn(mesh, K)
    fw16, vg16 = make_sharded_hscn(mesh, K, dtype=jnp.bfloat16)
    o_32 = np.asarray(fw32(hp, xb, okb, cb, plan)).reshape(n, -1)
    o_16 = np.asarray(fw16(hp, xb, okb, cb, plan)).reshape(n, -1)
    assert o_16.dtype == np.float32
    m = np.asarray(b.node_mask)
    np.testing.assert_allclose(o_16[m], o_32[m], rtol=0.15, atol=0.2)
    l16, g16 = vg16(hp, xb, okb, cb, plan, yb, okb)
    assert np.isfinite(float(l16))
    for g in jax.tree_util.tree_leaves(g16):
        assert np.asarray(g).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(g)))
