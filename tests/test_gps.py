"""GPS transformer-hybrid: masking correctness, long-range reach of the
global attention, and CLI-reachable training."""

import jax
import numpy as np

from graph_hscn_tpu.config.config import load_config, parse_config
from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.gps import GPSModel
from graph_hscn_tpu.runner import run_experiment


def _slotted(graphs, slot=128, extra_graphs=0):
    budget = PadBudget.for_dataset(graphs,
                                   batch_size=len(graphs) + extra_graphs)
    return pack_batch(graphs, budget, slot_nodes=slot)


def _model(**kw):
    defaults = dict(num_features=9, hidden_channels=32, num_classes=10,
                    num_layers=2, num_heads=4, dropout=0.0)
    defaults.update(kw)
    return GPSModel(**defaults)


def test_gps_padding_invariance():
    """Extra padding graphs/slots must not change real-graph logits —
    attention over padded slots is fully masked."""
    graphs = make_peptides_func(num_graphs=6, seed=0, mean_nodes=40)
    model = _model()
    b1 = _slotted(graphs)
    b2 = _slotted(graphs, extra_graphs=4)
    params = model.init(jax.random.PRNGKey(0), b1, train=False)
    y1 = np.asarray(model.apply(params, b1, train=False))
    y2 = np.asarray(model.apply(params, b2, train=False))
    G = len(graphs)
    np.testing.assert_allclose(y2[:G], y1[:G], rtol=1e-5, atol=1e-5)


def test_gps_global_attention_reaches_disconnected_nodes():
    """A node with NO edges on the far side of a graph still influences
    every other node's output through the attention branch — the
    long-range capability pure MPNNs lack at low depth."""
    graphs = make_peptides_func(num_graphs=2, seed=1, mean_nodes=30)
    b = _slotted(graphs)
    model = _model(num_layers=1)
    params = model.init(jax.random.PRNGKey(0), b, train=False)
    base = np.asarray(model.apply(params, b, train=False))

    # Perturb the features of the LAST real node of graph 0; graph 1's
    # readout must not move, graph 0's must (despite 1 layer of local
    # conv, the perturbed node feeds every graph-0 node via attention).
    nf = np.asarray(b.node_feat).copy()
    n0 = int(np.asarray(b.n_node)[0])
    nf[n0 - 1] += 10.0
    b_pert = b.replace(node_feat=type(b.node_feat)(nf)
                       if not isinstance(b.node_feat, np.ndarray) else nf)
    pert = np.asarray(model.apply(params, b_pert, train=False))
    assert np.abs(pert[0] - base[0]).max() > 1e-4
    np.testing.assert_allclose(pert[1], base[1], rtol=1e-5, atol=1e-6)


def test_gps_requires_slotted_layout():
    graphs = make_peptides_func(num_graphs=4, seed=2, mean_nodes=30)
    budget = PadBudget.for_dataset(graphs, batch_size=4)
    b = pack_batch(graphs, budget)          # no slot_nodes
    model = _model()
    try:
        model.init(jax.random.PRNGKey(0), b, train=False)
        assert False, "expected ValueError without slotted layout"
    except ValueError as e:
        assert "slotted" in str(e)


def test_gps_cli_smoke(tmp_path):
    cfg = load_config("configs/GPS/peptides_func_GPS.yaml")
    cfg.data.num_graphs = 48
    cfg.data.batch_size = 12
    cfg.mpnn.hidden_channels = 16
    cfg.mpnn.num_layers = 2
    cfg.mpnn.num_heads = 2
    cfg.training.epochs = 2
    cfg.training.eval_period = 2
    result = run_experiment(cfg, log_file=tmp_path / "gps.log")
    assert np.isfinite(result.history[-1]["train_loss"])


def test_gps_with_trainable_signnet_pe(tmp_path):
    """GPS composes with the PE subsystem (EncodedModel wrapper is
    model-agnostic): SignNet-encoded features feed the attention stack."""
    raw = {
        "data": {"dataset_name": "peptides_func", "batch_size": 8,
                 "num_graphs": 24},
        "mp": {"conv_type": "gps", "activation": "relu",
               "hidden_channels": 16, "num_layers": 2, "num_heads": 2,
               "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.001,
                  "weight_decay": 5e-4},
        "pe": {"use": True, "frozen_random": False},
        "training": {"model_type": "gps", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 2, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg, log_file=tmp_path / "gps_pe.log")
    assert np.isfinite(result.history[-1]["train_loss"])


def test_gps_node_level_cli_smoke(tmp_path):
    """GPS on node-level superpixel classification (readout='none')."""
    cfg = load_config("configs/GPS/voc_superpixels_GPS.yaml")
    cfg.data.num_graphs = 24
    cfg.data.batch_size = 8
    cfg.mpnn.hidden_channels = 16
    cfg.mpnn.num_layers = 2
    cfg.mpnn.num_heads = 2
    cfg.mpnn.dropout = 0.0
    cfg.training.epochs = 2
    cfg.training.eval_period = 2
    result = run_experiment(cfg, log_file=tmp_path / "gps_node.log")
    assert np.isfinite(result.history[-1]["train_loss"])
    assert "validation_perf" in result.history[-1]


def test_gps_gatedgcn_local_struct_cli_smoke(tmp_path):
    """GPS with a GatedGCN local module on edge-featured regression
    (Peptides-struct, L1/MAE) + cosine schedule — the GraphGPS recipe."""
    cfg = load_config("configs/GPS/peptides_struct_GPS.yaml")
    cfg.data.num_graphs = 32
    cfg.data.batch_size = 8
    cfg.mpnn.hidden_channels = 16
    cfg.mpnn.num_layers = 2
    cfg.mpnn.num_heads = 2
    cfg.mpnn.dropout = 0.0
    cfg.optim.warmup_steps = 2
    cfg.training.epochs = 2
    cfg.training.eval_period = 2
    result = run_experiment(cfg, log_file=tmp_path / "gps_struct.log")
    assert np.isfinite(result.history[-1]["train_loss"])


def test_gps_heads_divisibility_validated():
    raw = {
        "data": {"dataset_name": "peptides_func"},
        "mp": {"conv_type": "gps", "activation": "relu",
               "hidden_channels": 30, "num_heads": 4},
        "training": {"model_type": "gps", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap"},
    }
    try:
        parse_config(raw)
        assert False, "expected divisibility check to fire"
    except ValueError as e:
        assert "num_heads" in str(e)
