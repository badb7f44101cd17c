"""End-to-end slice: GCN on synthetic Peptides-func must train (loss down,
AP above chance), mirroring BASELINE config 1 (GCN graph classification)."""

import numpy as np

from graph_hscn_tpu.config.config import (DataConfig, MPNNConfig, OptimConfig,
                                          TrainingConfig)
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.models.mpnn import build_mpnn
from graph_hscn_tpu.train.loop import fit
from graph_hscn_tpu.utils.logger import Logger


def test_gcn_trains_on_peptides_func():
    data_cfg = DataConfig(dataset_name="peptides_func", batch_size=16,
                          num_graphs=96)
    model_cfg = MPNNConfig(conv_type="gcn", activation="relu",
                           hidden_channels=32, num_layers=3, dropout=0.1)
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.005, weight_decay=5e-4)
    training_cfg = TrainingConfig(model_type="gcn", loss_fn="cross_entropy",
                                  metric="ap", epochs=12, eval_period=4,
                                  patience=50, min_delta=0.0)
    dm = DataModule.from_config(data_cfg)
    model = build_mpnn(model_cfg, dm.num_features, dm.num_classes)
    logger = Logger(metric_name="ap")
    result = fit(model,
                 lambda epoch: dm.train_batches(epoch_seed=epoch),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, logger)
    first, last = result.history[0], result.history[-1]
    assert last["train_loss"] < first["train_loss"], "loss must decrease"
    # Train-split AP is computed from in-flight (dropout-noised, evolving)
    # predictions exactly like the reference (train.py:79-99); val AP is the
    # clean signal.
    assert last["validation_perf"] > 0.55, (
        f"val AP {last['validation_perf']} not > chance")
    assert result.epochs_run == 12


def test_early_stopping_semantics():
    """Patience counts eval periods without min_delta improvement
    (reference train.py:198-214, quirk #13)."""
    data_cfg = DataConfig(dataset_name="peptides_func", batch_size=16,
                          num_graphs=48)
    model_cfg = MPNNConfig(conv_type="gcn", activation="relu",
                           hidden_channels=8, num_layers=2, dropout=0.0)
    optim_cfg = OptimConfig(optim_type="adam", lr=0.0, weight_decay=0.0)
    # lr=0 -> no improvement ever -> stop after patience eval periods.
    training_cfg = TrainingConfig(model_type="gcn", loss_fn="cross_entropy",
                                  metric="ap", epochs=50, eval_period=2,
                                  patience=2, min_delta=0.01)
    dm = DataModule.from_config(data_cfg)
    model = build_mpnn(model_cfg, dm.num_features, dm.num_classes)
    logger = Logger(metric_name="ap")
    result = fit(model, lambda epoch: dm.train_batches(epoch_seed=epoch),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, logger)
    assert result.stopped_early
    # Eval epochs are 0, 1, 3, 5, ... ; first eval sets best, two more
    # non-improving evals trigger the stop at epoch 3 (4 epochs run).
    assert result.epochs_run <= 6


def test_struct_regression_trains():
    data_cfg = DataConfig(dataset_name="peptides_struct", batch_size=16,
                          num_graphs=64)
    model_cfg = MPNNConfig(conv_type="gcn", activation="relu",
                           hidden_channels=32, num_layers=3, dropout=0.0)
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.003, weight_decay=1e-5)
    training_cfg = TrainingConfig(model_type="gcn", loss_fn="l1",
                                  metric="mae", epochs=10, eval_period=5,
                                  patience=50, min_delta=0.0)
    dm = DataModule.from_config(data_cfg)
    model = build_mpnn(model_cfg, dm.num_features, dm.num_classes,
                       compat=False)
    logger = Logger(metric_name="mae")
    result = fit(model, lambda epoch: dm.train_batches(epoch_seed=epoch),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, logger)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    # MAE on z-scored targets: must beat predicting the mean (~0.8).
    assert result.history[-1]["train_perf"] < 1.0
