"""Device-resident dataset: on-device batch assembly equivalence with the
host packer, and the epoch-as-a-program training path."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.config.config import (DataConfig, MPNNConfig,
                                          OptimConfig, TrainingConfig)
from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.data import synthetic
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.mpnn import MPNN
from graph_hscn_tpu.train.device_data import (DeviceDataset, assemble,
                                              epoch_permutation)
from graph_hscn_tpu.train.loop import fit_device
from graph_hscn_tpu.utils.logger import Logger


def test_assemble_matches_host_packer():
    graphs = make_peptides_func(num_graphs=6, seed=61, mean_nodes=35)
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    ds = DeviceDataset.build(graphs, slot=slot, device_put=False)
    idx = jnp.asarray(np.arange(6, dtype=np.int32))
    dev_batch = assemble(ds, idx)

    budget = PadBudget.for_dataset(graphs, batch_size=6)
    host_batch = pack_batch(graphs, budget, slot_nodes=slot)

    # Receivers globally sorted (CSR invariant).
    assert (np.diff(np.asarray(dev_batch.receivers)) >= 0).all()
    # Same node features on real rows.
    np.testing.assert_allclose(
        np.asarray(dev_batch.node_feat)[np.asarray(dev_batch.node_mask)],
        np.asarray(host_batch.node_feat)[np.asarray(host_batch.node_mask)])
    np.testing.assert_array_equal(np.asarray(dev_batch.n_node[:6]),
                                  np.asarray(host_batch.n_node[:6]))
    np.testing.assert_allclose(np.asarray(dev_batch.y[:6]),
                               np.asarray(host_batch.y[:6]))

    # Model outputs identical between host-packed and device-assembled.
    model = MPNN(conv_type="gcn", activation="relu", num_features=9,
                 hidden_channels=16, num_classes=10, num_layers=3,
                 dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), host_batch, train=False)
    out_host = np.asarray(model.apply(params, host_batch, train=False))
    out_dev = np.asarray(model.apply(params, dev_batch, train=False))
    np.testing.assert_allclose(out_dev[:6], out_host[:6], rtol=2e-4,
                               atol=2e-4)


def test_assemble_dummy_slots_masked():
    graphs = make_peptides_func(num_graphs=4, seed=62, mean_nodes=30)
    ds = DeviceDataset.build(graphs, device_put=False)
    idx = jnp.asarray(np.array([2, 0, -1, -1], np.int32))
    b = assemble(ds, idx)
    assert int(b.graph_mask.sum()) == 2
    gm = np.asarray(b.graph_mask)
    assert not gm[2] and not gm[3]
    # Dummy slots contribute no nodes/edges.
    ng = np.asarray(b.node_graph)
    nm = np.asarray(b.node_mask)
    assert not nm[(ng == 2)].any()
    assert int(b.n_node[2]) == 0


def test_epoch_permutation():
    p = epoch_permutation(10, 4, seed=0)
    assert p.shape == (3, 4)
    vals = p.reshape(-1)
    assert sorted(vals[vals >= 0].tolist()) == list(range(10))
    assert (vals == -1).sum() == 2


def test_fit_device_trains():
    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=8, num_graphs=64))
    model_cfg = MPNNConfig(conv_type="gcn", activation="relu",
                           hidden_channels=32, num_layers=3, dropout=0.1)
    model = MPNN(conv_type="gcn", activation="relu", num_features=9,
                 hidden_channels=32, num_classes=10, num_layers=3,
                 dropout=0.1)
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.005, weight_decay=5e-4)
    training_cfg = TrainingConfig(model_type="gcn",
                                  loss_fn="cross_entropy", metric="ap",
                                  epochs=10, eval_period=5, patience=50,
                                  min_delta=0.0)
    result = fit_device(model, dm.split("train"), dm.split("val"),
                        dm.split("test"), batch_size=8,
                        optim_cfg=optim_cfg, training_cfg=training_cfg,
                        logger=Logger(metric_name="ap"))
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert result.history[-1]["validation_perf"] > 0.5


def test_cached_adjacency_matches_scatter_build():
    """DeviceDataset's one-time uint8 adjacency cache, gathered at
    assemble time, equals ops/dense.build_dense_adj's per-step scatter
    (incl. zeroed dummy slots and partial batches)."""
    import dataclasses

    from graph_hscn_tpu.ops.dense import build_dense_adj

    graphs = synthetic.make_peptides_func(num_graphs=12, seed=9,
                                          mean_nodes=40)
    ds = DeviceDataset.build(graphs)
    assert ds.adj is not None
    idx = jnp.asarray([3, 7, -1, 0], jnp.int32)     # incl. a dummy slot
    b = jax.jit(assemble)(ds, idx)
    assert b.dense_adj is not None
    rebuilt = build_dense_adj(dataclasses.replace(b, dense_adj=None))
    np.testing.assert_array_equal(np.asarray(b.dense_adj),
                                  np.asarray(rebuilt))


def test_weighted_graphs_refused_and_oversize_cache_skipped():
    import pytest

    from graph_hscn_tpu.train import device_data as dd

    graphs = synthetic.make_peptides_func(num_graphs=4, seed=2,
                                          mean_nodes=30)
    # The device-resident layout cannot carry per-edge weights; building
    # one from weighted graphs must refuse loudly, not drop them.
    weighted = [g.replace(edge_weight=np.ones(g.num_edges, np.float32))
                for g in graphs]
    with pytest.raises(ValueError, match="edge_weight"):
        DeviceDataset.build(weighted)

    old = dd.ADJ_CACHE_BUDGET_BYTES
    try:
        dd.ADJ_CACHE_BUDGET_BYTES = 1
        assert DeviceDataset.build(graphs).adj is None
    finally:
        dd.ADJ_CACHE_BUDGET_BYTES = old
