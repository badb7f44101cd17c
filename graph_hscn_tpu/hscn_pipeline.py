"""The 4-stage HSCN pipeline (reference main.py:100-119):

  1. SCN clustering pre-train        (train/clustering.py)
  2. graph rewrite -> clusters        (a field on GraphData; no HeteroData —
                                       the rewrite is pure tensor ops inside
                                       the HSCN forward)
  3. batches with cluster ids
  4. supervised HSCN training         (train/loop.py)
"""

from __future__ import annotations

from graph_hscn_tpu.config.config import ExperimentConfig
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.models.hscn import build_hscn
from graph_hscn_tpu.models.scn import build_scn
from graph_hscn_tpu.train.clustering import train_clustering
from graph_hscn_tpu.train.loop import FitResult, fit


def run_hscn_pipeline(cfg: ExperimentConfig, dm: DataModule, logger
                      ) -> FitResult:
    hscn_cfg = cfg.hscn

    if getattr(dm, "use_device_dataset", False):
        return run_hscn_pipeline_device(cfg, dm, logger)

    # Stage 1: clustering pre-train.
    scn = build_scn(hscn_cfg, dm.num_features,
                    max_nodes=_round8(dm.max_nodes_per_graph()))
    clusters = train_clustering(logger, dm, scn, hscn_cfg, cfg.optim,
                                seed=cfg.training.seed)

    # Stage 2: attach cluster ids (the whole "hetero rewrite").
    dm.graphs = [g.replace(cluster=c) for g, c in zip(dm.graphs, clusters)]

    # Stage 3+4: HSCN training on cluster-annotated batches.
    node_level = dm.task_level == "node"
    from graph_hscn_tpu.models.layers import resolve_dtype
    model = build_hscn(hscn_cfg, dm.num_classes,
                       compat_triangular=cfg.compat.vv_triangular_pattern,
                       compat_index_shift=cfg.compat.cluster_index_shift,
                       readout="none" if node_level else "mean",
                       dtype=resolve_dtype(cfg.runtime.compute_dtype))
    checkpointer = None
    if cfg.training.checkpoint_dir:
        from graph_hscn_tpu.train.checkpoint import Checkpointer
        checkpointer = Checkpointer(cfg.training.checkpoint_dir)
    result = fit(
        model,
        # Per-epoch reshuffle, matching the device-resident path's
        # seed + epoch convention (train/loop.py fit_on_device_dataset).
        lambda epoch: dm.train_batches(epoch_seed=dm.seed + epoch),
        dm.eval_batches("val"), dm.eval_batches("test"),
        cfg.optim, cfg.training, logger,
        node_level=node_level,
        compat_sigmoid_score=cfg.compat.sigmoid_regression_score,
        checkpointer=checkpointer,
    )
    logger.finish()
    return result


def run_hscn_pipeline_device(cfg: ExperimentConfig, dm: DataModule, logger
                             ) -> FitResult:
    """Fully device-resident HSCN pipeline: one HBM dataset shared across
    the clustering pre-train (epoch-as-a-program), on-device cluster
    inference (written straight back into the dataset's cluster field),
    and the supervised HSCN fit."""
    import numpy as np

    from graph_hscn_tpu.train.clustering import train_clustering_device
    from graph_hscn_tpu.train.device_data import DeviceDataset
    from graph_hscn_tpu.train.loop import fit_on_device_dataset

    hscn_cfg = cfg.hscn
    # Dataset order = train|val|test (matches split id construction).
    splits = {k: dm.split(k) for k in ("train", "val", "test")}
    all_graphs = splits["train"] + splits["val"] + splits["test"]
    ds = DeviceDataset.build(all_graphs, slot=dm.slot_nodes,
                             with_cluster=True)
    n_tr, n_va = len(splits["train"]), len(splits["val"])
    split_ids = {
        "train": np.arange(n_tr),
        "val": np.arange(n_tr, n_tr + n_va),
        "test": np.arange(n_tr + n_va, len(all_graphs)),
    }

    # Stage 1+2: clustering on the full dataset (reference main.py:107
    # semantics), clusters written back into the device dataset.
    scn = build_scn(hscn_cfg, dm.num_features, max_nodes=ds.slot)
    ds = train_clustering_device(logger, ds, dm.batch_size, scn, hscn_cfg,
                                 cfg.optim, seed=cfg.training.seed)

    # Stage 3+4: HSCN fit over the same dataset.
    node_level = dm.task_level == "node"
    from graph_hscn_tpu.models.layers import resolve_dtype
    model = build_hscn(hscn_cfg, dm.num_classes,
                       compat_triangular=cfg.compat.vv_triangular_pattern,
                       compat_index_shift=cfg.compat.cluster_index_shift,
                       readout="none" if node_level else "mean",
                       dtype=resolve_dtype(cfg.runtime.compute_dtype))
    checkpointer = None
    if cfg.training.checkpoint_dir:
        from graph_hscn_tpu.train.checkpoint import Checkpointer
        checkpointer = Checkpointer(cfg.training.checkpoint_dir)
    result = fit_on_device_dataset(
        model, ds, split_ids, dm.batch_size, cfg.optim, cfg.training,
        logger, node_level=node_level,
        compat_sigmoid_score=cfg.compat.sigmoid_regression_score,
        checkpointer=checkpointer,
        profile_dir=cfg.runtime.profile_dir,
        train_edges=sum(g.num_edges for g in splits["train"]))
    logger.finish()
    return result


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8
