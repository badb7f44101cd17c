"""Experiment runner: config -> data -> model -> training.

The orchestration layer of the framework (reference run_train, main.py:85-120)
with both pipelines:

  MPNN: build_mpnn -> fit
  HSCN: SCN cluster pre-train (train/clustering.py) -> cluster assignments ->
        hetero virtual-node batches (data/hetero.py) -> HSCN -> fit
"""

from __future__ import annotations

import jax

from graph_hscn_tpu.config.config import ExperimentConfig
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.models.mpnn import build_mpnn
from graph_hscn_tpu.train.loop import FitResult, fit
from graph_hscn_tpu.utils.logger import Logger


def run_experiment(cfg: ExperimentConfig, log_file=None) -> FitResult:
    from graph_hscn_tpu.utils.profiling import (enable_compile_cache,
                                                maybe_init_distributed)
    enable_compile_cache()
    maybe_init_distributed(cfg.runtime.multihost)
    jax.config.update("jax_default_matmul_precision",
                      cfg.runtime.matmul_precision)
    from graph_hscn_tpu.models.layers import resolve_dtype
    compute_dtype = resolve_dtype(cfg.runtime.compute_dtype)
    if cfg.runtime.spmm_backend in ("xla", "pallas"):
        from graph_hscn_tpu.ops import spmm as spmm_mod
        spmm_mod.set_backend(cfg.runtime.spmm_backend)
    if cfg.runtime.debug_nans:
        from graph_hscn_tpu.utils.profiling import nan_guard
        nan_guard(True)
    logger = Logger(log_file=log_file, metric_name=cfg.training.metric,
                    use_wandb=cfg.training.use_wandb,
                    wandb_project=cfg.training.wandb_proj_name
                    or cfg.project_name)
    dm = DataModule.from_config(cfg.data, pad_safety=cfg.runtime.pad_safety)
    logger.info(f"Dataset {cfg.data.dataset_name}: {len(dm.graphs)} graphs, "
                f"budget nodes={dm.budget.num_nodes} "
                f"edges={dm.budget.num_edges}")
    if dm.budgets is not None and len(dm.budgets) > 1:
        logger.info("Shape buckets: " + ", ".join(
            f"(n={b.num_nodes}, e={b.num_edges})" for b in dm.budgets))

    # Execution-path selection: slotted dense blocks (MXU matmuls) for
    # molecular-scale graphs, Pallas SpMM plans for the sparse path on TPU.
    from graph_hscn_tpu.config import defaults as D
    if cfg.runtime.dense_path in ("auto", "dense"):
        enabled = dm.enable_dense_slots(max_slot=D.DENSE_PATH_MAX_NODES)
        if enabled:
            logger.info(f"Dense slotted path on: slot={dm.slot_nodes}")
        elif cfg.runtime.dense_path == "dense":
            raise ValueError("dense path requested but a graph exceeds "
                             f"max slot {D.DENSE_PATH_MAX_NODES}")
    if cfg.runtime.spmm_backend in ("auto", "pallas") and not dm.slot_nodes:
        dm.with_spmm_plan = jax.default_backend() == "tpu" or \
            cfg.runtime.spmm_backend == "pallas"

    if cfg.pe is not None:
        from graph_hscn_tpu.transform.posenc import attach_posenc
        attach_posenc(dm, cfg.pe, logger,
                      frozen_random=cfg.compat.frozen_random_signnet,
                      seed=cfg.training.seed)

    node_level = dm.task_level == "node"

    import numpy as _np

    from graph_hscn_tpu.parallel.mesh import resolve_mesh_shape
    shape = resolve_mesh_shape(cfg.mesh.shape)
    mesh_size = int(_np.prod(shape))

    if cfg.hscn is not None:
        # edge_partition is an explicit opt-in; honor it even on a
        # 1-device mesh (identical shard_map program — lets the single
        # attached chip run/validate the giant-graph path).
        if cfg.mesh.edge_partition:
            # Giant-graph HSCN: sharded SCN clustering + sharded hetero
            # conv over the edge-partitioned mesh (parallel/sharded_scn.py).
            if not node_level:
                raise ValueError("mesh.edge_partition targets node-level "
                                 "tasks (giant-graph full-batch training)")
            if len(shape) != 1:
                raise ValueError("edge-partitioned HSCN takes a 1-D mesh")
            if cfg.pe is not None and not cfg.compat.frozen_random_signnet:
                raise ValueError(
                    "edge-partitioned paths support PE only as the "
                    "precomputed transform; set "
                    "compat.frozen_random_signnet: true")
            from graph_hscn_tpu.parallel.mesh import make_mesh
            from graph_hscn_tpu.parallel.sharded_scn import \
                fit_hscn_edge_partitioned
            mesh = make_mesh(tuple(cfg.mesh.axes), tuple(shape),
                             devices=jax.devices()[:mesh_size])
            checkpointer = None
            if cfg.training.checkpoint_dir:
                from graph_hscn_tpu.train.checkpoint import Checkpointer
                checkpointer = Checkpointer(cfg.training.checkpoint_dir)
            logger.info(f"Edge-partitioned HSCN pipeline over {mesh_size} "
                        "devices (sharded SCN clustering + halo-exchange "
                        "hetero conv).")
            result = fit_hscn_edge_partitioned(
                dm, mesh, cfg.hscn, cfg.optim, cfg.training, logger,
                checkpointer=checkpointer,
                reorder=cfg.mesh.locality_reorder,
                vv_pattern=("triangular"
                            if cfg.compat.vv_triangular_pattern
                            else "clique"),
                dtype=compute_dtype)
            logger.finish()
            return result
        from graph_hscn_tpu.hscn_pipeline import run_hscn_pipeline
        dm.use_device_dataset = _use_device_dataset(cfg, dm)
        return run_hscn_pipeline(cfg, dm, logger)

    if _use_fused_stack(cfg, dm, node_level):
        from graph_hscn_tpu.models.fused_gcn import FusedDenseGCN
        logger.info("Fused Pallas GCN stack on"
                    + (f" ({cfg.runtime.compute_dtype} compute, f32 "
                       "accumulation/logits)."
                       if compute_dtype is not None else "."))
        model = FusedDenseGCN(
            hidden_channels=cfg.mpnn.hidden_channels,
            num_classes=dm.num_classes,
            num_layers=cfg.mpnn.num_layers,
            dropout=cfg.mpnn.dropout,
            readout="none" if node_level else "mean",
            interpret=jax.default_backend() != "tpu",
            dtype=compute_dtype)
    else:
        model = build_mpnn(cfg.mpnn, dm.num_features, dm.num_classes,
                           compat=cfg.compat.double_relu,
                           readout="none" if node_level else "mean",
                           dtype=compute_dtype)
        if compute_dtype is not None:
            logger.info(f"Mixed precision: {cfg.runtime.compute_dtype} "
                        "compute, f32 params/logits.")
    if cfg.pe is not None and not cfg.compat.frozen_random_signnet:
        # End-to-end trainable SignNet (the sane fix of quirk #6).
        from graph_hscn_tpu.models.encoded import wrap_with_signnet
        model = wrap_with_signnet(model, cfg.pe, dm.num_features)
    checkpointer = None
    if cfg.training.checkpoint_dir:
        from graph_hscn_tpu.train.checkpoint import Checkpointer
        checkpointer = Checkpointer(cfg.training.checkpoint_dir)

    if mesh_size > 1 or cfg.mesh.edge_partition:
        # Data-parallel SPMD over the configured mesh (SURVEY §2.4 DP row):
        # psum-reduced shard_map steps, update identical to single-device.
        # edge_partition is honored even on a 1-device mesh (identical
        # shard_map program — lets the single attached chip run the
        # giant-graph path end-to-end).
        from graph_hscn_tpu.parallel.data_parallel import fit_dp
        from graph_hscn_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < mesh_size:
            raise ValueError(
                f"mesh.shape={shape} needs {mesh_size} "
                f"devices, have {len(jax.devices())}")
        mesh = make_mesh(tuple(cfg.mesh.axes), tuple(shape),
                         devices=jax.devices()[:mesh_size])
        if cfg.mesh.edge_partition:
            # TP/SP-analog: node blocks sharded, per-layer halo exchange.
            if not node_level:
                raise ValueError("mesh.edge_partition targets node-level "
                                 "tasks (giant-graph full-batch training)")
            if cfg.pe is not None and not cfg.compat.frozen_random_signnet:
                # Trainable SignNet lives in the flax model wrapper, which
                # the sharded per-device programs don't use — refuse
                # rather than silently train without PE.
                raise ValueError(
                    "edge-partitioned paths support PE only as the "
                    "precomputed transform; set "
                    "compat.frozen_random_signnet: true")
            if len(shape) == 2:
                # Hybrid 2-D: data-parallel graph groups x edge-partitioned
                # blocks (parallel/hybrid.py).
                from graph_hscn_tpu.parallel.hybrid import fit_hybrid
                logger.info(f"Hybrid {shape[0]}x{shape[1]} training "
                            f"(axes {list(cfg.mesh.axes)}: DP groups x "
                            "halo-exchange edge partition).")
                result = fit_hybrid(dm, mesh, cfg.mpnn, cfg.optim,
                                    cfg.training, logger,
                                    checkpointer=checkpointer,
                                    reorder=cfg.mesh.locality_reorder)
                logger.finish()
                return result
            from graph_hscn_tpu.parallel.sharded_gcn import \
                fit_edge_partitioned
            logger.info(f"Edge-partitioned training over {mesh_size} "
                        "devices (halo-exchange sharded GCN).")
            result = fit_edge_partitioned(dm, mesh, cfg.mpnn, cfg.optim,
                                          cfg.training, logger,
                                          checkpointer=checkpointer,
                                          reorder=cfg.mesh.locality_reorder,
                                          dtype=compute_dtype)
            logger.finish()
            return result
        logger.info(f"Data-parallel training over {mesh_size} devices "
                    f"(mesh axes {list(cfg.mesh.axes)}).")
        result = fit_dp(model, dm, mesh, cfg.optim, cfg.training, logger,
                        node_level=node_level,
                        compat_sigmoid_score=(
                            cfg.compat.sigmoid_regression_score),
                        checkpointer=checkpointer)
        logger.finish()
        return result

    if _use_device_dataset(cfg, dm):
        from graph_hscn_tpu.train.loop import fit_device
        logger.info("Device-resident dataset path on "
                    "(epoch-as-a-program).")
        result = fit_device(
            model, dm.split("train"), dm.split("val"), dm.split("test"),
            batch_size=cfg.data.batch_size,
            optim_cfg=cfg.optim, training_cfg=cfg.training, logger=logger,
            node_level=node_level,
            compat_sigmoid_score=cfg.compat.sigmoid_regression_score,
            checkpointer=checkpointer, slot=dm.slot_nodes,
            profile_dir=cfg.runtime.profile_dir,
        )
    else:
        result = fit(
            model,
            # Fresh batch composition every epoch (reference DataLoader
            # shuffle=True semantics, loader.py:48-60).
            lambda epoch: dm.train_batches(epoch_seed=dm.seed + epoch),
            dm.eval_batches("val"), dm.eval_batches("test"),
            cfg.optim, cfg.training, logger,
            node_level=node_level,
            compat_sigmoid_score=cfg.compat.sigmoid_regression_score,
            checkpointer=checkpointer,
        )
    logger.finish()
    return result


def _use_fused_stack(cfg: ExperimentConfig, dm, node_level: bool) -> bool:
    mode = cfg.runtime.fused_stack
    if mode == "off" or cfg.mpnn is None:
        return False
    # bf16 compute is supported in-kernel (f32 accumulation, f32 logits)
    # since round 5 — the fusion and bandwidth levers compose.
    eligible = (cfg.mpnn.conv_type.lower() == "gcn"
                and cfg.mpnn.activation.lower() == "relu"
                and not cfg.mpnn.use_batch_norm
                and not cfg.mpnn.use_layer_norm
                and dm.slot_nodes is not None)
    if mode == "on":
        if not eligible:
            raise ValueError("fused_stack requested but config ineligible "
                             "(needs gcn+relu+dense slots)")
        return True
    # "auto": route by config intent.  matmul_precision: highest marks an
    # accuracy-pinned (reference-parity) run — take the conservative
    # unfused XLA path there: two independent 24-seed fused studies sat
    # ~0.010 below the unfused arm on peptides-func AP (not resolvable at
    # affordable n, both kernels verified op-exact; BASELINE.md round-5),
    # and a parity claim should not ride an unresolved distributional
    # question for a ~5% epoch win.  Perf-oriented (unpinned) configs and
    # explicit `fused_stack: on` keep the fused kernels.
    if cfg.runtime.matmul_precision == "highest":
        return False
    import jax as _jax
    return eligible and _jax.default_backend() == "tpu"


def _use_device_dataset(cfg: ExperimentConfig, dm) -> bool:
    mode = cfg.runtime.device_dataset
    if mode == "off":
        return False
    slot = dm.slot_nodes or (((dm.max_nodes_per_graph() + 7) // 8) * 8)
    est_mb = (len(dm.graphs) * slot * dm.num_features * 4) / 1e6
    fits = est_mb <= cfg.runtime.device_dataset_max_mb
    if mode == "on":
        return True
    return fits


def run_eval(cfg: ExperimentConfig, which: str = "best", log_file=None,
             predict_out: str | None = None):
    """Eval-only / inference mode: restore a checkpoint and score the val
    and test splits.  New capability vs the reference (it defines
    MODEL_DIR but never saves or loads weights, constants.py:6).

    For the HSCN pipeline the cluster assignments are not part of the
    snapshot; stage-1 clustering is deterministic given training.seed, so
    it is re-run to reconstruct them before restoring HSCN weights.

    ``predict_out``: path of an ``.npz`` to receive the prediction export
    (``{split}_scores`` / ``{split}_targets`` over real rows) — the
    serving surface (LRGB submissions, downstream consumers).
    """
    from graph_hscn_tpu.models.layers import resolve_dtype
    from graph_hscn_tpu.train.checkpoint import Checkpointer
    from graph_hscn_tpu.train.loop import evaluate_checkpoint

    if not cfg.training.checkpoint_dir:
        raise ValueError("eval mode needs training.checkpoint_dir")
    from graph_hscn_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    jax.config.update("jax_default_matmul_precision",
                      cfg.runtime.matmul_precision)
    compute_dtype = resolve_dtype(cfg.runtime.compute_dtype)
    logger = Logger(log_file=log_file, metric_name=cfg.training.metric,
                    use_wandb=False)
    sink = {} if predict_out else None
    dm = DataModule.from_config(cfg.data, pad_safety=cfg.runtime.pad_safety)
    if cfg.runtime.dense_path in ("auto", "dense"):
        from graph_hscn_tpu.config import defaults as D
        dm.enable_dense_slots(max_slot=D.DENSE_PATH_MAX_NODES)
    if cfg.pe is not None:
        from graph_hscn_tpu.transform.posenc import attach_posenc
        attach_posenc(dm, cfg.pe, logger,
                      frozen_random=cfg.compat.frozen_random_signnet,
                      seed=cfg.training.seed)
    node_level = dm.task_level == "node"

    if cfg.mesh.edge_partition:
        # Sharded eval: rebuild the packed splits + shard_map forward and
        # restore the sharded param pytree (fit_*'s eval_only mode).
        import numpy as _np

        from graph_hscn_tpu.parallel.mesh import (make_mesh,
                                                  resolve_mesh_shape)
        shape = resolve_mesh_shape(cfg.mesh.shape)
        mesh = make_mesh(tuple(cfg.mesh.axes), tuple(shape),
                         devices=jax.devices()[:int(_np.prod(shape))])
        checkpointer = Checkpointer(cfg.training.checkpoint_dir)
        if cfg.hscn is not None:
            if len(shape) != 1:
                raise ValueError("edge-partitioned HSCN takes a 1-D mesh")
            from graph_hscn_tpu.parallel.sharded_scn import \
                fit_hscn_edge_partitioned
            results, meta = fit_hscn_edge_partitioned(
                dm, mesh, cfg.hscn, cfg.optim, cfg.training, logger,
                checkpointer=checkpointer,
                reorder=cfg.mesh.locality_reorder,
                vv_pattern=("triangular"
                            if cfg.compat.vv_triangular_pattern
                            else "clique"),
                eval_only=which, predictions_sink=sink)
        elif len(shape) == 2:
            from graph_hscn_tpu.parallel.hybrid import fit_hybrid
            results, meta = fit_hybrid(
                dm, mesh, cfg.mpnn, cfg.optim, cfg.training, logger,
                checkpointer=checkpointer,
                reorder=cfg.mesh.locality_reorder, eval_only=which,
                predictions_sink=sink)
        else:
            from graph_hscn_tpu.parallel.sharded_gcn import \
                fit_edge_partitioned
            results, meta = fit_edge_partitioned(
                dm, mesh, cfg.mpnn, cfg.optim, cfg.training, logger,
                checkpointer=checkpointer,
                reorder=cfg.mesh.locality_reorder, eval_only=which,
                # Same program as training-time eval (a bf16-trained
                # 'best' must be re-scored by the bf16 forward).
                dtype=compute_dtype, predictions_sink=sink)
        for split, m in results.items():
            logger.info(f"[eval:{which}] {split}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in m.items()))
        if meta:
            logger.info(f"[eval:{which}] snapshot meta: {meta}")
        _maybe_write_predictions(predict_out, sink, logger)
        logger.finish()
        return results

    if cfg.hscn is not None:
        from graph_hscn_tpu.models.hscn import build_hscn
        from graph_hscn_tpu.models.scn import build_scn
        from graph_hscn_tpu.train.clustering import train_clustering
        scn = build_scn(cfg.hscn, dm.num_features,
                        max_nodes=((dm.max_nodes_per_graph() + 7) // 8) * 8)
        clusters = train_clustering(logger, dm, scn, cfg.hscn, cfg.optim,
                                    seed=cfg.training.seed)
        dm.graphs = [g.replace(cluster=c)
                     for g, c in zip(dm.graphs, clusters)]
        model = build_hscn(
            cfg.hscn, dm.num_classes,
            compat_triangular=cfg.compat.vv_triangular_pattern,
            compat_index_shift=cfg.compat.cluster_index_shift,
            readout="none" if node_level else "mean", dtype=compute_dtype)
    elif _use_fused_stack(cfg, dm, node_level):
        # Mirror run_experiment's model choice: a checkpoint written by
        # the fused-stack trainer carries FusedDenseGCN's param tree
        # (kernel_i/bias_i), which build_mpnn cannot restore.
        from graph_hscn_tpu.models.fused_gcn import FusedDenseGCN
        model = FusedDenseGCN(
            hidden_channels=cfg.mpnn.hidden_channels,
            num_classes=dm.num_classes,
            num_layers=cfg.mpnn.num_layers,
            dropout=cfg.mpnn.dropout,
            readout="none" if node_level else "mean",
            interpret=jax.default_backend() != "tpu",
            dtype=compute_dtype)
    else:
        model = build_mpnn(cfg.mpnn, dm.num_features, dm.num_classes,
                           compat=cfg.compat.double_relu,
                           readout="none" if node_level else "mean",
                           dtype=compute_dtype)
        if cfg.pe is not None and not cfg.compat.frozen_random_signnet:
            from graph_hscn_tpu.models.encoded import wrap_with_signnet
            model = wrap_with_signnet(model, cfg.pe, dm.num_features)

    checkpointer = Checkpointer(cfg.training.checkpoint_dir)
    results, meta = evaluate_checkpoint(
        model,
        {"val": dm.eval_batches("val"), "test": dm.eval_batches("test")},
        cfg.optim, cfg.training, checkpointer, which=which,
        node_level=node_level,
        compat_sigmoid_score=cfg.compat.sigmoid_regression_score,
        predictions_sink=sink)
    for split, m in results.items():
        logger.info(f"[eval:{which}] {split}: " + ", ".join(
            f"{k}={v:.4f}" for k, v in m.items()))
    if meta:
        logger.info(f"[eval:{which}] snapshot meta: {meta}")
    _maybe_write_predictions(predict_out, sink, logger)
    logger.finish()
    return results


def _maybe_write_predictions(predict_out, sink, logger):
    if not predict_out or sink is None:
        return
    import numpy as _np
    arrays = {f"{split}_{k}": v for split, d in sink.items()
              for k, v in d.items()}
    _np.savez(predict_out, **arrays)
    logger.info(f"[predict] wrote {', '.join(sorted(arrays))} "
                f"to {predict_out}")
