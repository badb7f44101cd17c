"""PE end-to-end through the runner: frozen-random (reference quirk #6
semantics) and trainable SignNet modes."""

import numpy as np
import yaml

from graph_hscn_tpu.config.config import parse_config
from graph_hscn_tpu.runner import run_experiment


def _base_cfg(frozen: bool):
    return parse_config({
        "data": {"dataset_name": "peptides_func", "batch_size": 8,
                 "num_graphs": 32},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 16, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.005,
                  "weight_decay": 5.0e-4},
        "pe": {"use": True, "dim_in": 16, "dim_emb": 16, "dim_pe": 4,
               "eig_max_freqs": 8, "phi_hidden_dim": 8, "phi_out_dim": 4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 3, "eval_period": 2, "patience": 50,
                     "min_delta": 0.0},
        "compat": {"frozen_random_signnet": frozen},
    })


def test_frozen_random_pe_runs(tmp_path):
    cfg = _base_cfg(frozen=True)
    result = run_experiment(cfg, log_file=tmp_path / "pe1.log")
    assert np.isfinite(result.history[-1]["train_loss"])


def test_trainable_signnet_runs(tmp_path):
    cfg = _base_cfg(frozen=False)
    result = run_experiment(cfg, log_file=tmp_path / "pe2.log")
    assert np.isfinite(result.history[-1]["train_loss"])
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
