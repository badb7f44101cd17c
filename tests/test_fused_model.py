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
    result = fit(model, lambda epoch: dm.train_batches(epoch_seed=epoch),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, Logger(metric_name="ap"))
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]


def test_fused_dropout_stats_and_grads():
    """In-kernel dropout (external-bits path on CPU): correct drop
    fraction, deterministic under a fixed rng, and backward matches a
    pure-jnp oracle built from the masks recovered from the stored
    post-dropout activations."""
    import jax.numpy as jnp

    from graph_hscn_tpu.ops.pallas.fused_gcn_kernel import (_folded_operator,
                                                            fused_gcn_stack)

    rng = np.random.default_rng(3)
    G, S, F0, H, C, L = 4, 16, 9, 32, 10, 3
    rate = 0.4
    x = jnp.asarray(rng.normal(size=(G, S, F0)).astype(np.float32))
    adj_np = (rng.random((G, S, S)) < 0.2).astype(np.float32)
    adj_np = np.maximum(adj_np, adj_np.transpose(0, 2, 1))
    adj = jnp.asarray(adj_np)
    dims = [F0, H, H, C]
    params = [{"kernel": jnp.asarray(
                   rng.normal(size=(dims[i], dims[i + 1]))
                   .astype(np.float32) * 0.3),
               "bias": jnp.asarray(rng.normal(size=(dims[i + 1],))
                                   .astype(np.float32) * 0.1)}
              for i in range(L)]
    key = jax.random.PRNGKey(7)
    bits = [jax.random.bits(jax.random.fold_in(key, l), (G, S, dims[l + 1]),
                            dtype=jnp.uint32) for l in range(L - 1)]
    dropout = {"bits": bits}

    # --- statistics: each hidden layer drops ~rate of its entries ---
    from graph_hscn_tpu.ops.pallas.fused_gcn_kernel import _fwd
    acts = _fwd(x, adj, params, dropout, rate, True)
    thr = np.uint32(int(rate * 2 ** 32))
    for l in range(L - 1):
        kept = np.asarray(bits[l]) >= thr
        frac = kept.mean()
        assert abs(frac - (1 - rate)) < 0.03
        a = np.asarray(acts[l])
        assert (a[~kept] == 0).all()

    # determinism: same bits -> same output
    out1 = fused_gcn_stack(x, adj, params, dropout, rate, True)
    out2 = fused_gcn_stack(x, adj, params, dropout, rate, True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # --- grads vs oracle with the same masks ---
    a_hat = _folded_operator(adj)
    masks = [jnp.where(jnp.asarray(b) >= thr,
                       np.float32(1 / (1 - rate)), 0.0) for b in bits]

    def oracle(x, params):
        h = x
        for l in range(L):
            z = jnp.einsum("gij,gjf->gif", a_hat,
                           jnp.einsum("gsf,fo->gso", h,
                                      params[l]["kernel"]))
            z = z + params[l]["bias"]
            if l < L - 1:
                h = jnp.maximum(z, 0.0) * masks[l]
            else:
                h = z
        return jnp.sum(h ** 2)

    def fused(x, params):
        return jnp.sum(fused_gcn_stack(x, adj, params, dropout, rate,
                                       True) ** 2)

    np.testing.assert_allclose(float(oracle(x, params)),
                               float(fused(x, params)), rtol=1e-5)
    gx_o, gp_o = jax.grad(oracle, argnums=(0, 1))(x, params)
    gx_f, gp_f = jax.grad(fused, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_o),
                               rtol=2e-4, atol=2e-4)
    for l in range(L):
        np.testing.assert_allclose(np.asarray(gp_f[l]["kernel"]),
                                   np.asarray(gp_o[l]["kernel"]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gp_f[l]["bias"]),
                                   np.asarray(gp_o[l]["bias"]),
                                   rtol=2e-4, atol=2e-4)


def test_fused_model_trains_with_dropout():
    from graph_hscn_tpu.config.config import OptimConfig, TrainingConfig
    from graph_hscn_tpu.train.loop import fit
    from graph_hscn_tpu.utils.logger import Logger

    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=8, num_graphs=32))
    dm.enable_dense_slots()
    model = FusedDenseGCN(hidden_channels=32, num_classes=10, num_layers=3,
                          dropout=0.3, interpret=True)
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.005, weight_decay=5e-4)
    training_cfg = TrainingConfig(model_type="gcn",
                                  loss_fn="cross_entropy", metric="ap",
                                  epochs=4, eval_period=2, patience=50,
                                  min_delta=0.0)
    result = fit(model, lambda epoch: dm.train_batches(epoch_seed=epoch),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, Logger(metric_name="ap"))
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
