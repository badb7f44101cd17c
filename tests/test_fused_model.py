"""FusedDenseGCN model vs standard MPNN(gcn, relu, dropout=0): identical
forward with mapped weights, and it trains end-to-end."""

import jax
import numpy as np

from graph_hscn_tpu.config.config import (DataConfig, OptimConfig,
                                          TrainingConfig)
from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.fused_gcn import FusedDenseGCN
from graph_hscn_tpu.models.mpnn import MPNN


def test_fused_model_matches_mpnn():
    graphs = make_peptides_func(num_graphs=6, seed=101, mean_nodes=30)
    budget = PadBudget.for_dataset(graphs, batch_size=6)
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    batch = pack_batch(graphs, budget, slot_nodes=slot)

    mpnn = MPNN(conv_type="gcn", activation="relu", num_features=9,
                hidden_channels=16, num_classes=10, num_layers=3,
                dropout=0.0, compat_double_relu=True)
    vars_mpnn = mpnn.init(jax.random.PRNGKey(0), batch, train=False)
    out_ref = np.asarray(mpnn.apply(vars_mpnn, batch, train=False))

    fused = FusedDenseGCN(hidden_channels=16, num_classes=10, num_layers=3,
                          interpret=True)
    # Map the MPNN's GCNConv_i weights into the fused layout.
    p = vars_mpnn["params"]
    names = sorted(k for k in p if k.startswith("GCNConv"))
    fused_params = {"params": {}}
    for i, name in enumerate(names):
        fused_params["params"][f"kernel_{i}"] = p[name]["kernel"]
        fused_params["params"][f"bias_{i}"] = p[name]["bias"]
    out_fused = np.asarray(fused.apply(fused_params, batch, train=False))
    G = int(batch.graph_mask.sum())
    np.testing.assert_allclose(out_fused[:G], out_ref[:G], rtol=2e-4,
                               atol=2e-4)


def test_fused_model_trains():
    from graph_hscn_tpu.train.loop import fit
    from graph_hscn_tpu.utils.logger import Logger

    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=8, num_graphs=48))
    dm.enable_dense_slots()
    model = FusedDenseGCN(hidden_channels=32, num_classes=10, num_layers=3,
                          interpret=True)
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.005, weight_decay=5e-4)
    training_cfg = TrainingConfig(model_type="gcn",
                                  loss_fn="cross_entropy", metric="ap",
                                  epochs=6, eval_period=3, patience=50,
                                  min_delta=0.0)
    result = fit(model, lambda: dm.train_batches(),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, Logger(metric_name="ap"))
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
