"""Checkpoint round-trip: save best/latest during fit, restore, predictions
identical."""

import jax
import numpy as np

from graph_hscn_tpu.config.config import (DataConfig, MPNNConfig,
                                          OptimConfig, TrainingConfig)
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.models.mpnn import build_mpnn
from graph_hscn_tpu.train.checkpoint import Checkpointer
from graph_hscn_tpu.train.loop import fit, init_state, make_train_step
from graph_hscn_tpu.train.optimizers import build_optimizer
from graph_hscn_tpu.utils.logger import Logger


def test_checkpoint_roundtrip(tmp_path):
    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=8, num_graphs=32))
    model_cfg = MPNNConfig(conv_type="gcn", activation="relu",
                           hidden_channels=16, num_layers=2, dropout=0.0)
    model = build_mpnn(model_cfg, dm.num_features, dm.num_classes)
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.01, weight_decay=5e-4)
    training_cfg = TrainingConfig(model_type="gcn", loss_fn="cross_entropy",
                                  metric="ap", epochs=4, eval_period=2,
                                  patience=50, min_delta=0.0,
                                  checkpoint_dir=str(tmp_path / "ckpt"))
    ckpt = Checkpointer(tmp_path / "ckpt")
    logger = Logger(metric_name="ap")
    result = fit(model, lambda epoch: dm.train_batches(epoch_seed=epoch),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, logger, checkpointer=ckpt)
    assert ckpt.has("best")

    # Restore into a fresh state and compare predictions of saved params.
    tx = build_optimizer("adamW", 0.01, 5e-4)
    example = dm.example_batch()
    fresh = init_state(model, tx, example, seed=123)
    restored, meta = ckpt.restore("best", fresh)
    assert int(meta["epoch"]) >= 0

    _, eval_step = make_train_step(model, tx, "cross_entropy")
    out_restored = eval_step(restored, example)[1]
    # Fresh random state differs; restored state reproduces training state
    # at best epoch (smoke: finite and shaped).
    assert np.isfinite(np.asarray(out_restored)).all()
    # Restored params differ from fresh-init params.
    a = jax.tree_util.tree_leaves(fresh.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_auto_resume_from_latest(tmp_path):
    """fit with a checkpointer resumes from the latest snapshot: a second
    fit call with the same checkpoint_dir starts past the saved epoch and
    continues with the restored optimizer state."""
    from graph_hscn_tpu.config.config import (DataConfig, MPNNConfig,
                                              OptimConfig, TrainingConfig)
    from graph_hscn_tpu.data.pipeline import DataModule
    from graph_hscn_tpu.models.mpnn import build_mpnn
    from graph_hscn_tpu.train.checkpoint import Checkpointer
    from graph_hscn_tpu.train.loop import fit
    from graph_hscn_tpu.utils.logger import Logger

    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=8, num_graphs=24))
    model = build_mpnn(MPNNConfig(conv_type="gcn", activation="relu",
                                  hidden_channels=8, num_layers=2,
                                  dropout=0.0), dm.num_features,
                       dm.num_classes)
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.005,
                            weight_decay=5e-4)
    tcfg = dict(model_type="gcn", loss_fn="cross_entropy", metric="ap",
                eval_period=2, min_delta=0.0, patience=50,
                checkpoint_every=1)
    ck = Checkpointer(tmp_path)
    r1 = fit(model, lambda epoch: dm.train_batches(epoch_seed=epoch), dm.eval_batches("val"),
             dm.eval_batches("test"), optim_cfg,
             TrainingConfig(epochs=4, **tcfg), Logger(metric_name="ap"),
             checkpointer=ck)
    assert ck.has("latest")
    r2 = fit(model, lambda epoch: dm.train_batches(epoch_seed=epoch), dm.eval_batches("val"),
             dm.eval_batches("test"), optim_cfg,
             TrainingConfig(epochs=6, **tcfg), Logger(metric_name="ap"),
             checkpointer=Checkpointer(tmp_path))
    resumed_epochs = [h["epoch"] for h in r2.history]
    # Resumed run must not repeat epoch 0.
    assert min(resumed_epochs) > 0
    assert r2.epochs_run == 6


def test_eval_only_mode(tmp_path):
    """--eval mode: run_eval restores the best snapshot and reproduces the
    training run's best-val loss through the CLI code path."""
    from graph_hscn_tpu.config.config import ExperimentConfig
    from graph_hscn_tpu.runner import run_eval, run_experiment

    cfg = ExperimentConfig(
        data=DataConfig(dataset_name="peptides_func", batch_size=8,
                        num_graphs=32),
        mpnn=MPNNConfig(conv_type="gcn", activation="relu",
                        hidden_channels=16, num_layers=2, dropout=0.0),
        optim=OptimConfig(optim_type="adamW", lr=0.01, weight_decay=5e-4),
        training=TrainingConfig(model_type="gcn", loss_fn="cross_entropy",
                                metric="ap", epochs=4, eval_period=2,
                                patience=50, min_delta=0.0,
                                use_wandb=False,
                                checkpoint_dir=str(tmp_path / "ckpt")),
    )
    result = run_experiment(cfg)
    best_val = min(h["validation_loss"] for h in result.history
                   if "validation_loss" in h)
    scores = run_eval(cfg, which="best")
    assert set(scores) == {"val", "test"}
    assert np.isfinite(scores["test"]["ap"])
    np.testing.assert_allclose(scores["val"]["loss"], best_val,
                               rtol=1e-5, atol=1e-6)


def test_predict_export(tmp_path):
    """--eval --predict exports {split}_scores/{split}_targets npz on
    both the flax path and the edge-partitioned path."""
    import numpy as np

    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_eval, run_experiment

    raw = {
        "data": {"dataset_name": "peptides_func", "batch_size": 8,
                 "num_graphs": 24},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50,
                     "checkpoint_dir": str(tmp_path / "ck")},
    }
    run_experiment(parse_config(raw))
    out = tmp_path / "preds.npz"
    run_eval(parse_config(raw), which="best", predict_out=str(out))
    z = np.load(out)
    assert {"val_scores", "val_targets", "test_scores",
            "test_targets"} <= set(z.files)
    assert z["val_scores"].shape == z["val_targets"].shape
    assert np.isfinite(z["val_scores"]).all()

    raw_ep = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 10},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50,
                     "checkpoint_dir": str(tmp_path / "ck_ep")},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    run_experiment(parse_config(raw_ep))
    out2 = tmp_path / "preds_ep.npz"
    run_eval(parse_config(raw_ep), which="best", predict_out=str(out2))
    z2 = np.load(out2)
    assert np.isfinite(z2["test_scores"]).all()
    assert z2["val_scores"].shape[1] == 21


def test_async_write_roundtrip(tmp_path):
    """Async (default) writes land identically to sync writes, reads fence
    on the in-flight write, and a background failure surfaces at the next
    fence."""
    from graph_hscn_tpu.train.loop import TrainState
    rng = np.random.default_rng(0)
    state = TrainState(
        params={"w": rng.normal(size=(4, 3)).astype(np.float32)},
        opt_state={"m": np.zeros((4, 3), np.float32)},
        step=np.int64(7), rng=jax.random.PRNGKey(1))

    ck_async = Checkpointer(tmp_path / "a")          # async by default
    ck_async.save_latest(state, epoch=3)
    # has()/meta()/restore() fence on the pending write.
    assert ck_async.has("latest")
    assert ck_async.meta("latest") == {"epoch": 3}
    restored, meta = ck_async.restore("latest", state)
    np.testing.assert_array_equal(restored.params["w"], state.params["w"])
    assert int(restored.step) == 7 and meta["epoch"] == 3

    ck_sync = Checkpointer(tmp_path / "s", async_writes=False)
    ck_sync.save_latest(state, epoch=3)
    r2, _ = ck_sync.restore("latest", state)
    np.testing.assert_array_equal(np.asarray(r2.rng), np.asarray(restored.rng))

    # Back-to-back saves serialize (latest meta wins deterministically).
    for epoch in range(4, 8):
        ck_async.save_latest(state, epoch=epoch)
    assert ck_async.meta("latest") == {"epoch": 7}

    # A failing background write surfaces at the next fence.
    import pytest
    ck_bad = Checkpointer(tmp_path / "b")
    ck_bad._ckptr = None          # forces AttributeError inside the thread
    ck_bad.save_latest(state, epoch=0)
    with pytest.raises(BaseException):
        ck_bad.wait()


def test_eval_only_mode_fused_stack(tmp_path):
    """A checkpoint written by the fused-stack trainer (FusedDenseGCN
    param tree) must restore through run_eval's fused branch — round-5
    review finding: run_eval previously always rebuilt via build_mpnn and
    failed on fused checkpoints."""
    from graph_hscn_tpu.config.config import (ExperimentConfig,
                                              RuntimeConfig)
    from graph_hscn_tpu.runner import run_eval, run_experiment

    cfg = ExperimentConfig(
        data=DataConfig(dataset_name="peptides_func", batch_size=8,
                        num_graphs=32),
        mpnn=MPNNConfig(conv_type="gcn", activation="relu",
                        hidden_channels=16, num_layers=2, dropout=0.0),
        optim=OptimConfig(optim_type="adamW", lr=0.01, weight_decay=5e-4),
        training=TrainingConfig(model_type="gcn", loss_fn="cross_entropy",
                                metric="ap", epochs=4, eval_period=2,
                                patience=50, min_delta=0.0,
                                use_wandb=False,
                                checkpoint_dir=str(tmp_path / "ckpt")),
        runtime=RuntimeConfig(fused_stack="on"),
    )
    result = run_experiment(cfg)
    best_val = min(h["validation_loss"] for h in result.history
                   if "validation_loss" in h)
    scores = run_eval(cfg, which="best")
    assert np.isfinite(scores["test"]["ap"])
    np.testing.assert_allclose(scores["val"]["loss"], best_val,
                               rtol=1e-5, atol=1e-6)
