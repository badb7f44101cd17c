#!/usr/bin/env python
"""Walkthrough of the full Graph-HSCN pipeline, stage by stage — the
runnable analog of the reference's exploratory notebook
(notebooks/01-hetero.ipynb).

Run:  python examples/hscn_walkthrough.py        (CPU-friendly sizes)
Set WALKTHROUGH_TPU=1 to run on an attached accelerator instead.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    if not os.environ.get("WALKTHROUGH_TPU"):
        # CPU by default: the sizes here are demonstration-scale, and in
        # relay-attached environments an implicit TPU run pays ~30 s of
        # remote compile per stage for nothing.
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp

    from graph_hscn_tpu.config.config import (DataConfig, HSCNConfig,
                                              OptimConfig, TrainingConfig)
    from graph_hscn_tpu.data.pipeline import DataModule
    from graph_hscn_tpu.models.hscn import build_hscn, virtual_node_features
    from graph_hscn_tpu.models.scn import build_scn
    from graph_hscn_tpu.train.clustering import train_clustering
    from graph_hscn_tpu.train.loop import fit
    from graph_hscn_tpu.utils.logger import Logger

    logger = Logger(metric_name="ap")

    # ---- Stage 0: data ---------------------------------------------------
    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=8, num_graphs=64))
    logger.info(f"{len(dm.graphs)} molecular graphs; mean "
                f"{np.mean([g.num_nodes for g in dm.graphs]):.0f} nodes")

    # ---- Stage 1: SCN spectral clustering (MinCUT) -----------------------
    hscn_cfg = HSCNConfig(activation="relu", num_clusters=4,
                          cluster_epochs=3, mp_units=[16])
    optim_cfg = OptimConfig(optim_type="adamW", lr=0.005, weight_decay=5e-4)
    scn = build_scn(hscn_cfg, dm.num_features, max_nodes=512)
    clusters = train_clustering(logger, dm, scn, hscn_cfg, optim_cfg)
    sizes = np.bincount(np.concatenate(clusters), minlength=4)
    logger.info(f"cluster occupancy across the dataset: {sizes.tolist()}")

    # ---- Stage 2: virtual-node rewrite (pure tensor ops) -----------------
    dm.graphs = [g.replace(cluster=c) for g, c in zip(dm.graphs, clusters)]
    batch = dm.example_batch()
    x_v, v_active, _ = virtual_node_features(batch, 4)
    logger.info(f"virtual nodes in example batch: "
                f"{int(np.asarray(v_active).sum())} active of "
                f"{x_v.shape[0]} slots")

    # ---- Stage 3+4: HSCN training ---------------------------------------
    model = build_hscn(hscn_cfg, dm.num_classes)
    training_cfg = TrainingConfig(model_type="hscn",
                                  loss_fn="cross_entropy", metric="ap",
                                  epochs=5, eval_period=2, patience=50,
                                  min_delta=0.0)
    result = fit(model,
                 lambda epoch: dm.train_batches(epoch_seed=dm.seed + epoch),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 optim_cfg, training_cfg, logger)
    logger.info(f"done: val AP "
                f"{result.history[-1].get('validation_perf', 0):.3f}")

    # ---- Bonus: the same pipeline at giant-graph scale -------------------
    # hscn: + mesh.edge_partition packs each split as ONE batch whose node
    # blocks shard across a device mesh; stage 1 (MinCUT clustering) and
    # stage 4 (hetero conv) both run as halo-exchange shard_map programs
    # (parallel/sharded_scn.py, parallel/sharded_hscn.py).
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    giant = parse_config({
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 12},
        "hscn": {"activation": "relu", "hidden_channels": 8,
                 "num_layers": 2, "num_clusters": 4, "cluster_epochs": 2,
                 "mp_units": [8]},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "hscn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 4, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [-1],
                 "edge_partition": True},
    })
    giant_result = run_experiment(giant)
    logger.info(f"giant-graph HSCN pipeline: val F1 "
                f"{giant_result.history[-1].get('validation_perf', 0):.3f}")

    # ---- Bonus 2: the virtual->local feedback channel --------------------
    # The reference's HSCN never routes information back from virtual to
    # local nodes, so its virtual pathway cannot affect predictions
    # (quirk #17, proven by execution).  hscn.virtual_feedback adds the
    # missing per-layer v->l projection, ZERO-initialized: at init this
    # model IS the reference-faithful one, and training grows the channel
    # only where it helps (+0.012 mean AP in the 16-seed A/B study,
    # artifacts/VFB_STUDY_R5.json).
    fb = parse_config({
        "data": {"dataset_name": "peptides_func", "batch_size": 8,
                 "num_graphs": 32},
        "hscn": {"activation": "relu", "hidden_channels": 8,
                 "num_layers": 2, "num_clusters": 3, "cluster_epochs": 2,
                 "mp_units": [8], "virtual_feedback": True},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "hscn", "use_wandb": False,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "max_epochs": 4, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
    })
    fb_result = run_experiment(fb)
    logger.info(f"HSCN with virtual feedback: val AP "
                f"{fb_result.history[-1].get('validation_perf', 0):.3f}")


if __name__ == "__main__":
    main()
