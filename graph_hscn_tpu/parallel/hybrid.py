"""Hybrid 2-D parallelism: data-parallel groups x edge-partitioned blocks.

The scaling composition the 1-D paths can't express (SURVEY §2.4 lists DP
and the TP/SP-analog separately; this combines them): a 2-D device mesh
with axes ``("data", "model")`` of shape (Ddp, Dep).  The training split is
balanced into Ddp graph GROUPS; each group is packed into one padded block
that edge-partitions over the Dep devices of its data row, exactly like the
1-D sharded GCN/GAT (contiguous node blocks, receiver-owned edges,
per-layer targeted all_to_all halo exchange).

Why this beats flat 1-D edge-partitioning over Ddp*Dep devices for graph
BATCHES: graphs are disjoint, so halo traffic is within-graph — but a flat
D-way all_to_all still moves a [D, H, F] buffer per device per layer and
synchronizes all D devices.  The hybrid form keeps each halo exchange
inside a Dep-device row (smaller collective, rides fewer ICI hops on a
matching physical topology), and the cross-group communication collapses
to the gradient all-reduce, which happens once per step instead of once
per layer.  That is the standard DP-outer / model-inner hierarchy mapped
onto the graph domain.

Implementation: the per-device programs of parallel/sharded_gcn.py are
reused UNCHANGED — the leading device axis of every array is simply sharded
over BOTH mesh axes (``P(("data", "model"))``), the halo all_to_all rides
``"model"`` only, and loss/grads psum over ``("data", "model")``.  The only
genuinely new code is host-side: balancing groups and padding each group's
halo plan to common shapes so the blocks stack.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from graph_hscn_tpu.parallel.edge_partition import (apply_node_reorder,
                                                    locality_reorder,
                                                    plan_halo_exchange)

_AXES = ("data", "model")


def balance_groups(graphs, num_groups: int):
    """LPT (largest-first) balance of graphs into ``num_groups`` groups by
    node count.  Returns a list of index lists; every group is non-empty
    when len(graphs) >= num_groups."""
    order = np.argsort([-g.num_nodes for g in graphs])
    loads = np.zeros(num_groups)
    groups: list[list[int]] = [[] for _ in range(num_groups)]
    for i in order:
        d = int(np.argmin(loads))
        groups[d].append(int(i))
        loads[d] += graphs[int(i)].num_nodes
    return groups


def _pad_axis(a: np.ndarray, axis: int, size: int):
    if a.shape[axis] == size:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - a.shape[axis])
    return np.pad(a, pad)


def build_hybrid_split(graphs, d_dp: int, d_ep: int, reorder: bool = True):
    """Pack a split into stacked hybrid blocks.

    Returns (plan, x, y, node_ok, meta) where every plan leaf and array has
    leading axis Ddp*Dep (group-major, matching a row-major
    mesh.reshape(Ddp, Dep)), x/y/node_ok are [Ddp*Dep, Nb, ...], and meta
    carries the per-group masks/labels for host-side metrics.
    """
    from graph_hscn_tpu.data.batching import PadBudget, pack_batch, round_up

    groups = balance_groups(graphs, d_dp)
    # One shared budget: every group's graphs must fit in one batch.
    need_n = max(sum(graphs[i].num_nodes for i in g) for g in groups) + 1
    need_e = max(sum(graphs[i].num_edges for i in g) for g in groups)
    budget = PadBudget(num_nodes=round_up(need_n, d_ep * 8),
                       num_edges=round_up(max(need_e, 1), 128),
                       num_graphs=max(len(g) for g in groups) + 1)

    per_group = []
    for g in groups:
        # A split smaller than Ddp leaves some groups empty (tiny eval
        # splits): pack a dummy graph and mask every node out — it
        # contributes nothing to loss (ok=False) or metrics (node_mask).
        empty = not g
        b = pack_batch([graphs[i] for i in (g or [0])], budget)
        n = b.num_nodes_padded
        snd, rcv = np.asarray(b.senders), np.asarray(b.receivers)
        em = np.asarray(b.edge_mask)
        x = np.asarray(b.node_feat)
        # Graph-level batches (node_y None) still partition fine — only
        # the comm planning is meaningful then (scaling_report).
        y = (np.asarray(b.node_y) if b.node_y is not None
             else np.zeros((n, 1), np.float32))
        ok = np.asarray(b.node_mask)
        gid = np.asarray(b.node_graph).astype(np.int32)
        if empty:
            ok = np.zeros_like(ok)
            y = np.zeros_like(y)
        if reorder:
            perm = locality_reorder(snd, rcv, em, n, node_mask=ok)
            snd, rcv, x, y, ok, gid = apply_node_reorder(
                perm, snd, rcv, x, y, ok, gid)
            # Receiver-sort invariant for the SpMM plans (round-4 fix).
            from graph_hscn_tpu.parallel.edge_partition import \
                sort_edges_by_receiver
            snd, rcv, em, _ = sort_edges_by_receiver(snd, rcv, em, n)
        plan = plan_halo_exchange(snd, rcv, em, n, d_ep)
        per_group.append((plan, x, y, ok, (snd, rcv, em), gid))

    # Common padded shapes across groups.
    H = max(p["halo_width"] for p, *_ in per_group)
    el = max(p["snd_loc"].shape[1] for p, *_ in per_group)
    eh = max(p["snd_hal"].shape[1] for p, *_ in per_group)
    nb = per_group[0][0]["block_size"]

    stacked: dict[str, list[np.ndarray]] = {
        k: [] for k in ("send_idx", "snd_loc", "rcv_loc", "mask_loc",
                        "snd_hal", "rcv_hal", "mask_hal")}
    xs, ys, oks, gids = [], [], [], []
    for plan, x, y, ok, _, gid in per_group:
        hg = plan["halo_width"]
        send_idx = _pad_axis(plan["send_idx"], 2, H)        # [Dep, Dep, H]
        # Halo-table indices are o*Hg + slot; restride to the padded H.
        snd_hal = plan["snd_hal"]
        snd_hal = (snd_hal // hg) * H + (snd_hal % hg)
        stacked["send_idx"].append(send_idx)
        stacked["snd_loc"].append(_pad_axis(plan["snd_loc"], 1, el))
        stacked["rcv_loc"].append(_pad_axis(plan["rcv_loc"], 1, el))
        stacked["mask_loc"].append(_pad_axis(plan["mask_loc"], 1, el))
        stacked["snd_hal"].append(_pad_axis(snd_hal, 1, eh))
        stacked["rcv_hal"].append(_pad_axis(plan["rcv_hal"], 1, eh))
        stacked["mask_hal"].append(_pad_axis(plan["mask_hal"], 1, eh))
        xs.append(x.reshape(d_ep, nb, -1))
        ys.append(y.reshape(d_ep, nb, -1))
        oks.append(ok.reshape(d_ep, nb))
        gids.append(gid.reshape(d_ep, nb))

    plan_out = {k: jnp.asarray(np.concatenate(v, axis=0))
                for k, v in stacked.items()}
    # Group-local graph ids for the ring-attention GPS (per-graph
    # attention masking; the ring spans one data row = one group, so
    # group-local ids are exactly right).
    plan_out["gid_blocks"] = jnp.asarray(np.concatenate(gids, axis=0))
    x = jnp.asarray(np.concatenate(xs, axis=0))            # [Ddp*Dep, Nb, F]
    y = jnp.asarray(np.concatenate(ys, axis=0))
    ok = jnp.asarray(np.concatenate(oks, axis=0))
    meta = dict(block_size=nb, halo_width=H, groups=groups,
                node_y=np.concatenate([p[2].reshape(-1, p[2].shape[-1])
                                       for p in per_group], axis=0),
                node_mask=np.concatenate([p[3].reshape(-1)
                                          for p in per_group], axis=0),
                group_edges=[p[4] for p in per_group])
    return plan_out, x, y, ok, meta


def fit_hybrid(dm, mesh: Mesh, mpnn_cfg, optim_cfg, training_cfg, logger,
               checkpointer=None, reorder: bool = True,
               eval_only: str | None = None,
               predictions_sink: dict | None = None):
    """CLI-reachable hybrid training (mesh.axes: [data, model] +
    mesh.edge_partition: true): full-batch node-level training where each
    data row of the mesh owns a balanced group of graphs and
    edge-partitions it over the model axis.  Same eval cadence / early-stop
    semantics as the 1-D path (sharded_gcn.fit_edge_partitioned)."""
    import optax

    from graph_hscn_tpu.parallel.sharded_gcn import (init_sharded_gat_params,
                                                     init_sharded_gcn_params,
                                                     make_sharded_gat,
                                                     make_sharded_gcn)
    from graph_hscn_tpu.train.loop import (TrainState, _maybe_resume,
                                           is_eval_epoch, run_fit_loop)
    from graph_hscn_tpu.train.metrics import METRICS
    from graph_hscn_tpu.train.optimizers import build_optimizer

    if training_cfg.loss_fn != "softmax_cross_entropy":
        raise ValueError("hybrid path computes node-level softmax cross "
                         "entropy; set loss_fn: softmax_cross_entropy")
    d_dp, d_ep = (int(s) for s in mesh.devices.shape)
    metric_fn = METRICS[training_cfg.metric]

    def packed(split):
        graphs = dm.split(split)
        plan, x, y, ok, meta = build_hybrid_split(graphs, d_dp, d_ep,
                                                  reorder=reorder)
        plan["ok_blocks"] = ok   # ring-attention GPS key-mask side-channel
        logger.info(f"[hybrid {d_dp}x{d_ep}] {split}: "
                    f"{d_dp} groups x {d_ep} blocks x "
                    f"{meta['block_size']} rows, halo H={meta['halo_width']}")
        return plan, x, y, ok, meta

    splits = {name: packed(name) for name in ("train", "val", "test")}
    dims = ([dm.num_features]
            + [mpnn_cfg.hidden_channels] * (mpnn_cfg.num_layers - 1)
            + [dm.num_classes])
    conv = mpnn_cfg.conv_type.lower()
    kw = dict(axis="model", shard_axes=_AXES, grad_axes=_AXES)
    if conv == "gcn":
        params = init_sharded_gcn_params(
            jax.random.PRNGKey(training_cfg.seed), dims)
        forward, value_and_grad = make_sharded_gcn(
            mesh, num_layers=len(dims) - 1, **kw)
    elif conv == "gat":
        params = init_sharded_gat_params(
            jax.random.PRNGKey(training_cfg.seed), dims)
        forward, value_and_grad = make_sharded_gat(
            mesh, num_layers=len(dims) - 1, **kw)
    elif conv == "gps":
        # Ring-attention GPS on the hybrid mesh: the K/V ring and the
        # halo all_to_all ride the model axis, so attention spans exactly
        # one data row's graph group (per-graph masked via the
        # group-local gid blocks build_hybrid_split stacks into the plan).
        from graph_hscn_tpu.parallel.sharded_gps import (
            init_sharded_gps_params, make_sharded_gps)
        if getattr(mpnn_cfg, "gps_local_conv", "gcn").lower() != "gcn":
            raise ValueError(
                "the hybrid 2-D mesh implements the GCN local block for "
                "GPS; gps_local_conv: gatedgcn runs on the 1-D "
                "edge-partition mesh (mesh.axes: [data]) or single-device "
                "— its receiver-resident edge state is not sharded over "
                "the 2-D group layout")
        params = init_sharded_gps_params(
            jax.random.PRNGKey(training_cfg.seed), dm.num_features,
            mpnn_cfg.hidden_channels, dm.num_classes, mpnn_cfg.num_layers,
            mpnn_cfg.num_heads)
        _fw, _vg = make_sharded_gps(mesh, mpnn_cfg.num_layers,
                                    mpnn_cfg.num_heads, **kw)

        def forward(p, x, plan):
            return _fw(p, x, plan["gid_blocks"], plan["ok_blocks"], plan)

        def value_and_grad(p, x, plan, y, ok):
            return _vg(p, x, plan["gid_blocks"], plan["ok_blocks"],
                       plan, y)
    else:
        raise ValueError("hybrid path supports conv_type gcn, gat or gps, "
                         f"got {mpnn_cfg.conv_type!r}")
    tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                         optim_cfg.weight_decay,
                         optim_cfg.batch_accumulation,
                         optim_cfg.clip_grad_norm,
                         schedule=getattr(optim_cfg, "schedule", "constant"),
                         warmup_steps=getattr(optim_cfg, "warmup_steps", 0),
                         total_steps=training_cfg.epochs)  # 1 step/epoch
    opt_state = tx.init(params)

    def _apply(p, o, g):
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o

    apply_updates = jax.jit(_apply)

    def get_state():
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.asarray(0, jnp.int32),
                          rng=jax.random.PRNGKey(training_cfg.seed))

    def evaluate_any(split):
        plan, x, _, _, meta = splits[split]
        logits = np.asarray(forward(params, x, plan)).reshape(
            meta["node_mask"].shape[0], -1)
        mask = meta["node_mask"]
        y = meta["node_y"]
        logp = jax.nn.log_softmax(jnp.asarray(logits[mask]), axis=-1)
        loss = float(-jnp.mean(jnp.sum(jnp.asarray(y[mask]) * logp, -1)))
        return loss, metric_fn(y[mask], logits[mask])

    if eval_only:
        state, meta = checkpointer.restore(eval_only, get_state())
        params = state.params
        results = {}
        for split in ("val", "test"):
            loss, perf = evaluate_any(split)
            results[split] = {"loss": loss, training_cfg.metric: perf}
            if predictions_sink is not None:
                plan, x, _, _, meta_s = splits[split]
                logits = np.asarray(forward(params, x, plan)).reshape(
                    meta_s["node_mask"].shape[0], -1)
                mask = meta_s["node_mask"]
                predictions_sink[split] = {
                    "scores": logits[mask],
                    "targets": meta_s["node_y"][mask]}
        return results, meta

    state0, start_epoch, best_loss = _maybe_resume(get_state(),
                                                   checkpointer, logger)
    params, opt_state = state0.params, state0.opt_state

    plan_tr, xb, yb, okb, meta_tr = splits["train"]
    train_edges = sum(g.num_edges for g in dm.split("train"))

    def train_epoch(epoch):
        nonlocal params, opt_state
        loss, grads = value_and_grad(params, xb, plan_tr, yb, okb)
        params, opt_state = apply_updates(params, opt_state, grads)
        eval_now = is_eval_epoch(epoch, training_cfg.epochs,
                                 training_cfg.eval_period)
        perf = evaluate_any("train")[1] if eval_now else float("nan")
        return float(loss), perf, train_edges

    return run_fit_loop(training_cfg, logger, checkpointer, train_epoch,
                        evaluate_any, get_state, start_epoch=start_epoch,
                        best_loss=best_loss)
