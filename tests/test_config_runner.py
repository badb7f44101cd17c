"""Config parsing (reference YAML schema compatibility) + runner smoke tests
covering both pipelines end-to-end through the CLI code path."""

import numpy as np
import yaml

from graph_hscn_tpu.config.config import load_config, parse_config
from graph_hscn_tpu.runner import run_experiment


def test_parse_reference_style_yaml(tmp_path):
    """The reference's shipped YAML must parse unchanged (schema compat),
    with max_epochs honored (quirk #4 fixed)."""
    raw = {
        "data": {"dataset_name": "peptides_func", "batch_size": 32,
                 "num_workers": 0},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 16, "num_layers": 3, "dropout": 0.2,
               "use_batch_norm": False, "use_layer_norm": False},
        "optim": {"optim_type": "adamW", "batch_accumulation": 1,
                  "clip_grad_norm": False, "lr": 0.01,
                  "weight_decay": 5e-4},
        "pe": {"use": False, "dim_in": 16, "dim_pe": 4, "model": "DeepSet",
               "layers": 1, "post_layers": 1, "eig_max_freqs": 10,
               "eigvec_norm": "L2", "eig_lap_norm": "sym",
               "phi_hidden_dim": 16, "phi_out_dim": 4,
               "pass_as_var": False, "use_bn": False},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 500, "eval_period": 10,
                     "min_delta": 0.01, "patience": 2},
    }
    cfg = parse_config(raw)
    assert cfg.mpnn.conv_type == "gcn"
    assert cfg.training.epochs == 500           # max_epochs honored
    assert cfg.pe is None                       # pe.use False
    assert cfg.data.task_level == "graph"
    assert cfg.project_name == "peptides_func_gcn_3"
    # use_wandb False is allowed (reference quirk #3 fixed).
    assert cfg.training.use_wandb is False


def test_shipped_configs_parse():
    for p in ("configs/GCN/peptides_func_GCN.yaml",
              "configs/GCN/peptides_func_GCN_dp8.yaml",
              "configs/GCN/voc_superpixels_GCN_edge_partition.yaml",
              "configs/GCN/voc_superpixels_GCN_hybrid.yaml",
              "configs/GAT/peptides_func_GAT.yaml",
              "configs/GAT/voc_superpixels_GAT_edge_partition.yaml",
              "configs/GIN/peptides_func_GIN.yaml",
              "configs/HSCN/peptides_func_HSCN.yaml",
              "configs/HSCN/voc_superpixels_HSCN.yaml",
              "configs/GCN/voc_superpixels_GCN.yaml",
              "configs/GatedGCN/peptides_struct_GatedGCN.yaml",
              "configs/GPS/peptides_func_GPS.yaml",
              "configs/GPS/voc_superpixels_GPS.yaml",
              "configs/GPS/peptides_struct_GPS.yaml"):
        cfg = load_config(p)
        assert cfg.model_cfg is not None


def test_runner_mpnn_small(tmp_path):
    cfg = load_config("configs/GCN/peptides_func_GCN.yaml")
    cfg.data.num_graphs = 48
    cfg.data.batch_size = 8
    cfg.training.epochs = 3
    cfg.training.eval_period = 2
    result = run_experiment(cfg, log_file=tmp_path / "t.log")
    assert result.epochs_run >= 1
    assert np.isfinite(result.history[-1]["train_loss"])
    assert (tmp_path / "t.log").exists()


def test_runner_gat_gin_small(tmp_path):
    """GAT and GIN family configs train through the CLI code path (GIN is
    unconstructible in the reference, quirk #11 — usable here)."""
    for p in ("configs/GAT/peptides_func_GAT.yaml",
              "configs/GAT/voc_superpixels_GAT_edge_partition.yaml",
              "configs/GIN/peptides_func_GIN.yaml"):
        cfg = load_config(p)
        cfg.data.num_graphs = 32
        cfg.data.batch_size = 8
        cfg.training.epochs = 2
        cfg.training.eval_period = 2
        result = run_experiment(cfg, log_file=tmp_path / "t.log")
        assert result.epochs_run >= 1
        assert np.isfinite(result.history[-1]["train_loss"])


def test_runner_hscn_small(tmp_path):
    cfg = load_config("configs/HSCN/peptides_func_HSCN.yaml")
    cfg.data.num_graphs = 32
    cfg.data.batch_size = 8
    cfg.hscn.cluster_epochs = 2
    cfg.hscn.mp_units = [8]
    cfg.hscn.hidden_channels = 8
    cfg.training.epochs = 2
    cfg.training.eval_period = 2
    result = run_experiment(cfg, log_file=tmp_path / "h.log")
    assert np.isfinite(result.history[-1]["train_loss"])


def test_runner_gatedgcn_small(tmp_path):
    cfg = load_config("configs/GatedGCN/peptides_struct_GatedGCN.yaml")
    cfg.data.num_graphs = 32
    cfg.data.batch_size = 8
    cfg.mpnn.hidden_channels = 16
    cfg.mpnn.num_layers = 2
    cfg.training.epochs = 2
    cfg.training.eval_period = 2
    result = run_experiment(cfg, log_file=tmp_path / "g.log")
    assert np.isfinite(result.history[-1]["train_loss"])


def test_runner_data_parallel_mesh(tmp_path):
    """mesh.shape > 1 routes the runner through fit_dp (psum shard_map
    steps) on the 8 virtual CPU devices; training runs and evals."""
    raw = {
        "data": {"dataset_name": "peptides_func", "batch_size": 16,
                 "num_graphs": 48},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 3, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8]},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg)
    assert result.epochs_run == 3
    assert "validation_loss" in result.history[-1]
    assert np.isfinite(result.history[-1]["train_loss"])


def test_runner_edge_partitioned_mesh():
    """mesh.edge_partition routes node-level configs through the
    halo-exchange sharded GCN (full-batch per epoch)."""
    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 12},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 3, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg)
    assert result.epochs_run == 3
    assert np.isfinite(result.history[-1]["train_loss"])
    assert "validation_perf" in result.history[-1]
    # GAT variant: receiver-local attention over the same partitioning.
    raw["mp"]["conv_type"] = "gat"
    raw["training"]["model_type"] = "gat"
    result = run_experiment(parse_config(raw))
    assert result.epochs_run == 3
    assert np.isfinite(result.history[-1]["train_loss"])


def test_runner_dp_node_level_softmax():
    """DP path supports node-level softmax CE (previously raised), and
    mesh.shape [-1] resolves to all devices instead of silently running
    single-device."""
    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 16,
                 "num_graphs": 24},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [-1]},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg)
    assert result.epochs_run == 2
    assert np.isfinite(result.history[-1]["train_loss"])
    assert "validation_perf" in result.history[-1]


def test_runner_dp_with_fused_stack():
    """runtime.fused_stack + mesh DP: pack_for_devices threads slot_nodes,
    so FusedDenseGCN's slotted batches survive the DP packing."""
    raw = {
        "data": {"dataset_name": "peptides_func", "batch_size": 16,
                 "num_graphs": 32},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.1},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 2, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [4]},
        "runtime": {"fused_stack": "on"},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg)
    assert result.epochs_run == 2
    assert np.isfinite(result.history[-1]["train_loss"])


def test_multihost_auto_is_noop_without_coordinator(monkeypatch):
    """runtime.multihost="auto" must not initialize jax.distributed unless
    a coordinator is configured (single-host default stays untouched)."""
    from graph_hscn_tpu.utils import profiling

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    # Pod-style vars must NOT trigger auto (single-host rigs set them).
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert profiling.maybe_init_distributed("auto") is False
    assert profiling.maybe_init_distributed("off") is False

    calls = {}

    def fake_init(**kw):
        calls.update(kw or {"called": True})

    monkeypatch.setattr(profiling.jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert profiling.maybe_init_distributed("auto") is True
    assert calls == {"coordinator_address": "10.0.0.1:1234",
                     "num_processes": 4, "process_id": 2}


def test_fused_auto_routing_respects_precision_pin():
    """`fused_stack: auto` routes accuracy-pinned configs
    (matmul_precision: highest — the parity configs) to the unfused XLA
    path; unpinned configs stay kernel-eligible, and explicit "on"
    overrides the pin (BASELINE.md round-5: an unresolved ~0.01
    distributional question must not ride under a parity claim)."""
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.data.pipeline import DataModule
    from graph_hscn_tpu.runner import _use_fused_stack

    base = {
        "data": {"dataset_name": "peptides_func", "batch_size": 8,
                 "num_graphs": 16},
        "mp": {"conv_type": "gcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2},
        "training": {"model_type": "gcn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 1},
    }
    cfg = parse_config(dict(base,
                            runtime={"matmul_precision": "highest"}))
    dm = DataModule.from_config(cfg.data)
    dm.enable_dense_slots()
    assert dm.slot_nodes is not None
    assert _use_fused_stack(cfg, dm, node_level=False) is False

    cfg_on = parse_config(dict(base,
                               runtime={"matmul_precision": "highest",
                                        "fused_stack": "on"}))
    assert _use_fused_stack(cfg_on, dm, node_level=False) is True

    # Unpinned auto keeps kernel eligibility (True iff on TPU).
    import jax as _jax
    cfg_auto = parse_config(dict(base))
    expected = _jax.default_backend() == "tpu"
    assert _use_fused_stack(cfg_auto, dm, node_level=False) is expected
