"""LR schedules (optim.schedule / optim.warmup_steps): shape of the
schedule itself, config validation, and an end-to-end cosine run."""

import numpy as np
import pytest

from graph_hscn_tpu.config.config import parse_config
from graph_hscn_tpu.runner import run_experiment
from graph_hscn_tpu.train.optimizers import (build_optimizer,
                                             learning_rate_schedule)


def test_constant_is_a_float():
    assert learning_rate_schedule(0.01) == 0.01


def test_constant_with_warmup_ramps_then_holds():
    s = learning_rate_schedule(0.01, "constant", warmup_steps=10)
    assert float(s(0)) == 0.0
    assert float(s(5)) == pytest.approx(0.005)
    assert float(s(10)) == pytest.approx(0.01)
    assert float(s(1000)) == pytest.approx(0.01)


def test_cosine_peaks_after_warmup_and_decays_to_zero():
    s = learning_rate_schedule(0.01, "cosine", warmup_steps=10,
                               total_steps=100)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(0.01, rel=1e-3)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)
    assert 0.0 < float(s(55)) < 0.01


def test_linear_decay():
    s = learning_rate_schedule(0.01, "linear", total_steps=100)
    assert float(s(0)) == pytest.approx(0.01)
    assert float(s(50)) == pytest.approx(0.005)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-9)


def test_cosine_requires_total_steps():
    with pytest.raises(ValueError):
        learning_rate_schedule(0.01, "cosine")
    with pytest.raises(ValueError):
        build_optimizer("adamW", 0.01, 0.0, schedule="cosine")


def test_unknown_schedule_rejected_by_config():
    raw = {
        "data": {"dataset_name": "peptides_func"},
        "mp": {"conv_type": "gcn", "activation": "relu"},
        "optim": {"schedule": "exponential"},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap"},
    }
    with pytest.raises(ValueError):
        parse_config(raw)


@pytest.mark.parametrize("optim_type", ["adamW", "adam"])
def test_cosine_schedule_trains_e2e(optim_type, tmp_path):
    raw = {
        "data": {"dataset_name": "peptides_func", "batch_size": 8,
                 "num_graphs": 24},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": optim_type, "lr": 0.01,
                  "weight_decay": 5e-4, "schedule": "cosine",
                  "warmup_steps": 3},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 3, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg, log_file=tmp_path / "sched.log")
    assert result.epochs_run == 3
    assert np.isfinite(result.history[-1]["train_loss"])
