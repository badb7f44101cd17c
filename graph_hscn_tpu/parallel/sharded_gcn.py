"""Edge-partitioned multi-chip GCN: a full sharded training step for
node-level tasks on graphs too large for one chip (SURVEY §7.8 — the
multi-host milestone; BASELINE config 5 pairs PascalVOC-SP with it).

Sharding layout (parallel/edge_partition.py): contiguous node blocks per
device, edges owned by the receiver's device, targeted all_to_all halo
exchange of boundary features once per layer.  GCN semantics are identical
to models.layers.GCNConv (in-degree symmetric normalization with folded
self loops), verified against the unsharded model in tests.

Degree normalization needs each edge's *sender* degree, which may be
remote; the degree vector is halo-exchanged once up front (it is layer-
independent), then each layer exchanges only the current features.

Overlap (v3): each device's edges are pre-split into LOCAL-sender and
HALO-sender groups (plan_halo_exchange's snd_loc/snd_hal arrays).  Per
layer the all_to_all is issued before the local aggregation and consumed
after it; the two have no data dependency, so XLA's latency-hiding
scheduler hides the collective behind the local segment-sum.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from graph_hscn_tpu.ops.segment import segment_sum
from graph_hscn_tpu.ops.spmm import pallas_enabled
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange


def _halo(x_blk, send_idx, axis):
    """Exchange: returns the [D*H, F] halo table for this device."""
    outbound = jnp.take(x_blk, send_idx, axis=0)        # [D, H, F]
    inbound = jax.lax.all_to_all(outbound, axis, split_axis=0,
                                 concat_axis=0, tiled=False)
    return inbound.reshape(-1, x_blk.shape[-1])


_PLAN_KEYS = ("send_idx", "snd_loc", "rcv_loc", "mask_loc",
              "snd_hal", "rcv_hal", "mask_hal")


def _device_key(key, shard_axes):
    """Per-device PRNG key inside shard_map: fold the device's index on
    every sharded mesh axis into the replicated step key, so dropout
    masks differ across blocks but stay reproducible per (step, device).
    The same recipe as the fused GCN kernel's in-kernel dropout seeding
    (ops/pallas/fused_gcn_kernel.py)."""
    axes = (shard_axes if isinstance(shard_axes, (tuple, list))
            else (shard_axes,))
    for ax in axes:
        key = jax.random.fold_in(key, jax.lax.axis_index(ax))
    return key


def _dropout(h, key, layer_idx, rate):
    """Inverted dropout with a per-layer folded key (train only —
    forwards without a key run deterministically)."""
    kl = jax.random.fold_in(key, layer_idx)
    keep = jax.random.bernoulli(kl, 1.0 - rate, h.shape)
    return jnp.where(keep, h / (1.0 - rate), 0.0).astype(h.dtype)


def _make_local_agg(sp, snd_loc, rcv_loc, nb, use_spmm_plan,
                    weight_grad=True):
    """Local-sender weighted aggregation: the fused Pallas SpMM on this
    device's block when a plan is attached (d(edge_weight) via the SDDMM
    kernel in its VJP), else XLA gather + sorted segment-sum.

    ``weight_grad=False`` (structural weights, e.g. the sharded GCN's
    degree normalization) lets the kernel backward skip its SDDMM."""
    if use_spmm_plan:
        from graph_hscn_tpu.ops.pallas.spmm_kernel import (VMEM_X_BUDGET,
                                                           spmm_pallas,
                                                           spmm_pallas_hbm)
        sp_d = jax.tree_util.tree_map(lambda a: a[0], sp[0])

        def agg(feats, w):
            # Width gate: the one-hot kernel's MACs are lane-padded to
            # 128 columns, so below ~F=64 the padding wastes its MXU work
            # while the XLA scatter stays cheap — measured on the v5e
            # giant-graph HSCN: kernel 9% faster at hidden 128, 15%
            # SLOWER at hidden 32 (BASELINE round-4).  Narrow calls (the
            # MinCUT K-column A*S, thin stacks) stay XLA per call.
            if feats.shape[-1] < 64:
                return segment_sum(feats[snd_loc] * w[:, None], rcv_loc,
                                   nb)
            # Same regime routing as ops/spmm.gather_scatter: VMEM-resident
            # kernel, HBM-streamed kernel up to ~2x the budget (a 1-device
            # mesh sees the whole packed batch as one block), else XLA.
            # Lane-padded footprint (minor dim pads to 128 in VMEM).
            xbytes = nb * max(feats.shape[-1], 128) * feats.dtype.itemsize
            if xbytes <= VMEM_X_BUDGET:
                out = spmm_pallas(feats, sp_d, edge_weight=w,
                                  num_nodes=nb, weight_grad=weight_grad)
            elif xbytes <= 2 * VMEM_X_BUDGET:
                out = spmm_pallas_hbm(feats, sp_d, edge_weight=w,
                                      num_nodes=nb,
                                      weight_grad=weight_grad)
            else:
                return segment_sum(feats[snd_loc] * w[:, None], rcv_loc,
                                   nb)
            # Kernel accumulates in f32; rejoin the caller's compute
            # dtype so bf16 mixed precision composes with the plan path.
            return out.astype(feats.dtype)
        return agg

    def agg(feats, w):
        return segment_sum(feats[snd_loc] * w[:, None], rcv_loc, nb)
    return agg


def _make_local_agg_mh(sp, snd_loc, rcv_loc, nb, use_spmm_plan):
    """Multi-head local aggregation: ALL heads in one kernel launch via
    spmm_mh when a plan is attached (the sharded GAT previously looped H
    single-head launches, re-staging the same feature windows), else the
    XLA gather + segment-sum.  agg(feats [Nb, H, C], w [El, H], heads)."""
    if use_spmm_plan:
        from graph_hscn_tpu.ops.pallas.multihead_kernel import spmm_mh
        sp_d = jax.tree_util.tree_map(lambda a: a[0], sp[0])

        def agg(feats, w, heads):
            # Same width gate as _make_local_agg (total H*C columns).
            if feats.shape[-2] * feats.shape[-1] < 64:
                return segment_sum(feats[snd_loc] * w[..., None],
                                   rcv_loc, nb)
            out = spmm_mh(feats.reshape(nb, -1), w, sp_d, heads=heads,
                          num_nodes=nb)
            return out.reshape(nb, heads, -1).astype(feats.dtype)
        return agg

    def agg(feats, w, heads):
        return segment_sum(feats[snd_loc] * w[..., None], rcv_loc, nb)
    return agg


def init_sharded_gcn_params(rng, dims: list[int]) -> list[dict]:
    params = []
    for i in range(len(dims) - 1):
        rng, k = jax.random.split(rng)
        scale = jnp.sqrt(6.0 / (dims[i] + dims[i + 1]))
        params.append({
            "kernel": jax.random.uniform(k, (dims[i], dims[i + 1]),
                                         minval=-scale, maxval=scale),
            "bias": jnp.zeros((dims[i + 1],)),
        })
    return params


def make_sharded_gcn(mesh: Mesh, num_layers: int, axis: str = "data",
                     use_spmm_plan: bool = False, shard_axes=None,
                     grad_axes=None, dtype=None, dropout: float = 0.0):
    """Builds (forward_fn, train_step_fn) over the mesh.

    forward(params, x_blocks, plan_arrays) -> logits blocks [D, Nb, C]
    train_step(params, opt_state, tx, batch arrays) handled by caller via
    the returned grad_fn.
    All per-device arrays carry the leading device axis sharded over
    ``axis``; params are replicated.

    With ``use_spmm_plan`` the plan dict must carry ``spmm_loc`` (stacked
    per-device Pallas plans from edge_partition.local_spmm_plans); the
    local-sender aggregation then runs the fused windowed one-hot MXU
    SpMM kernel while the halo all_to_all is in flight (SURVEY §2.4
    "async collective + Pallas compute").

    Hybrid 2-D meshes (parallel/hybrid.py): ``axis`` is the mesh axis the
    halo all_to_all rides (the edge-partition axis), ``shard_axes`` the
    axis/axes the leading device dimension of the arrays is sharded over
    (e.g. ``("data", "model")``), and ``grad_axes`` the axes the loss and
    gradients are all-reduced over.  Both default to ``axis`` (the 1-D
    edge-partition layout).

    ``dtype`` (e.g. jnp.bfloat16): mixed-precision compute — params stay
    f32 master copies, features/halos/aggregations run in ``dtype``
    (HALVING the per-layer all_to_all payload), logits return f32.
    Composes with ``use_spmm_plan``: the kernel takes bf16 operands
    (f32 accumulation on the MXU) and the aggregation rejoins ``dtype``.
    """
    n_extra = 1 if use_spmm_plan else 0
    shard_axes = shard_axes if shard_axes is not None else axis
    grad_axes = grad_axes if grad_axes is not None else axis
    has_key = dropout > 0.0   # training programs carry a PRNG step key

    def per_device_forward(params, x_blk, send_idx, snd_loc, rcv_loc,
                           m_loc, snd_hal, rcv_hal, m_hal, *sp, key=None):
        x = x_blk[0]
        send_idx = send_idx[0]
        snd_loc, rcv_loc, m_loc = snd_loc[0], rcv_loc[0], m_loc[0]
        snd_hal, rcv_hal, m_hal = snd_hal[0], rcv_hal[0], m_hal[0]
        nb = x.shape[0]
        # gcn_norm weights are degree-derived (no trainable params):
        # the kernel backward skips its SDDMM dw pass.
        local_agg = _make_local_agg(sp, snd_loc, rcv_loc, nb,
                                    use_spmm_plan, weight_grad=False)

        # Global in-degree of owned nodes (all owned edges are local).
        deg = (segment_sum(jnp.where(m_loc, 1.0, 0.0), rcv_loc, nb)
               + segment_sum(jnp.where(m_hal, 1.0, 0.0), rcv_hal, nb)
               + 1.0)                                    # + self loop
        dinv = jax.lax.rsqrt(deg)
        # Sender-side dinv may be remote: exchange once.
        dinv_halo = _halo(dinv[:, None], send_idx, axis)[:, 0]
        w_loc = jnp.where(m_loc, dinv[snd_loc] * dinv[rcv_loc], 0.0)
        w_hal = jnp.where(m_hal, dinv_halo[snd_hal] * dinv[rcv_hal], 0.0)
        diag = dinv * dinv
        if dtype is not None:
            x = x.astype(dtype)
            w_loc, w_hal, diag = (w_loc.astype(dtype),
                                  w_hal.astype(dtype), diag.astype(dtype))

        h = x
        for li, layer in enumerate(params):
            kernel, bias = layer["kernel"], layer["bias"]
            if dtype is not None:
                kernel, bias = kernel.astype(dtype), bias.astype(dtype)
            h = h @ kernel
            # Issue the exchange first; aggregate local edges while the
            # all_to_all is in flight; consume the halo last.
            halo = _halo(h, send_idx, axis)
            agg = local_agg(h, w_loc)
            agg = agg + segment_sum(halo[snd_hal] * w_hal[:, None],
                                    rcv_hal, nb)
            h = agg + diag[:, None] * h + bias
            if layer is not params[-1]:
                h = jax.nn.relu(h)
                if key is not None:
                    # Reference MPNN semantics: dropout after the
                    # activation on non-final layers (mpnn.py:58).
                    h = _dropout(h, key, li, dropout)
        return h.astype(jnp.float32)[None]

    forward = jax.jit(jax.shard_map(
        per_device_forward, mesh=mesh,
        in_specs=(P(),) + (P(shard_axes),) * (8 + n_extra),
        out_specs=P(shard_axes),
        check_vma=False,
    ))

    def per_device_value_grad(params, x_blk, send_idx, snd_loc, rcv_loc,
                              m_loc, snd_hal, rcv_hal, m_hal, y_blk,
                              node_ok_blk, gcnt, *rest):
        if has_key:
            key, *sp = rest
            key = _device_key(key, shard_axes)
        else:
            key, sp = None, rest

        def local_loss(params):
            logits = per_device_forward(
                params, x_blk, send_idx, snd_loc, rcv_loc, m_loc,
                snd_hal, rcv_hal, m_hal, *sp, key=key)[0]
            y = y_blk[0]
            ok = node_ok_blk[0].astype(logits.dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
            return jnp.sum(per * ok) / gcnt

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, grad_axes)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, grad_axes), grads)
        return loss, grads

    def _extras(plan):
        return (plan["spmm_loc"],) if use_spmm_plan else ()

    def value_and_grad(params, x_blocks, plan, y_blocks, node_ok_blocks,
                       key=None):
        gcnt = float(np.maximum(np.asarray(node_ok_blocks).sum(), 1.0))
        extras = _extras(plan)
        if has_key:
            if key is None:
                raise ValueError(
                    "dropout > 0 training steps need a fresh per-step "
                    "PRNG key (a fixed default would reuse identical "
                    "masks every step; fit_edge_partitioned folds the "
                    "epoch into training.seed)")
            extras = (key,) + extras
        return _vg(params, x_blocks, *(plan[k] for k in _PLAN_KEYS),
                   y_blocks, node_ok_blocks, gcnt, *extras)

    _vg = jax.jit(jax.shard_map(
        per_device_value_grad, mesh=mesh,
        in_specs=(P(),) + (P(shard_axes),) * 10 + (None,)
        + ((P(),) if has_key else ())
        + (P(shard_axes),) * n_extra,
        out_specs=(P(), P()),
        check_vma=False,
    ), static_argnums=(11,))

    def forward_wrapper(params, x_blocks, plan):
        return forward(params, x_blocks, *(plan[k] for k in _PLAN_KEYS),
                       *_extras(plan))

    return forward_wrapper, value_and_grad


def shard_node_blocks(mesh: Mesh, num_devices: int, *arrays,
                      axis: str = "data"):
    from graph_hscn_tpu.parallel.edge_partition import shard_arrays
    out = []
    for a in arrays:
        n = a.shape[0]
        nb = n // num_devices
        out.append(a.reshape(num_devices, nb, *a.shape[1:]))
    return shard_arrays(mesh, *out, axis=axis)


def fit_edge_partitioned(dm, mesh: Mesh, mpnn_cfg, optim_cfg, training_cfg,
                         logger, checkpointer=None, axis: str = "data",
                         reorder: bool = True, eval_only: str | None = None,
                         dtype=None, predictions_sink: dict | None = None):
    """CLI-reachable edge-partitioned training (mesh.edge_partition: true):
    each split is packed into ONE padded batch whose node blocks shard
    across the mesh — full-batch gradient descent per epoch, the standard
    regime for giant-graph node classification.  Same eval cadence /
    early-stop semantics as train.loop.fit.  Node-level softmax CE only
    (the sharded GCN's loss, per_device_value_grad above — the name
    follows train.loss.criterion: 'softmax_cross_entropy')."""
    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
    from graph_hscn_tpu.train.loop import (TrainState, _maybe_resume,
                                           is_eval_epoch, run_fit_loop)
    from graph_hscn_tpu.train.metrics import METRICS
    from graph_hscn_tpu.train.optimizers import build_optimizer

    if training_cfg.loss_fn != "softmax_cross_entropy":
        raise ValueError(
            "edge-partitioned path computes node-level softmax cross "
            "entropy; set loss_fn: softmax_cross_entropy")
    D = int(np.prod(mesh.devices.shape))
    metric_fn = METRICS[training_cfg.metric]
    conv = mpnn_cfg.conv_type.lower()
    # Regularization config must not be silently dropped (VERDICT round-2
    # item 4; same refusal pattern as the trainable-PE case in runner.py).
    if (getattr(mpnn_cfg, "use_batch_norm", False)
            or getattr(mpnn_cfg, "use_layer_norm", False)):
        raise ValueError(
            "edge-partitioned paths implement no batch/layer norm (norms "
            "need cross-device statistics the sharded per-device programs "
            "don't compute); set use_batch_norm/use_layer_norm: false")
    drop = float(getattr(mpnn_cfg, "dropout", 0.0) or 0.0)

    def packed(split):
        from types import SimpleNamespace

        from graph_hscn_tpu.parallel.edge_partition import (
            apply_node_reorder, locality_reorder)
        graphs = dm.split(split)
        budget = PadBudget.for_dataset(graphs, batch_size=len(graphs),
                                       node_multiple=D * 8)
        b = pack_batch(graphs, budget)
        n = b.num_nodes_padded
        snd, rcv = np.asarray(b.senders), np.asarray(b.receivers)
        em = np.asarray(b.edge_mask)
        x, y = np.asarray(b.node_feat), np.asarray(b.node_y)
        node_ok = np.asarray(b.node_mask)
        gid = np.asarray(b.node_graph).astype(np.int32)
        if reorder:
            # Cuthill-McKee order before blocking: halo width (per-layer
            # all_to_all volume) drops on locality-rich graphs; results
            # are permutation-invariant (node-level loss/metrics are sets).
            perm = locality_reorder(snd, rcv, em, n, node_mask=node_ok)
            snd, rcv, x, y, node_ok, gid = apply_node_reorder(
                perm, snd, rcv, x, y, node_ok, gid)
            # Restore the receiver-sort invariant the SpMM plans need
            # (round-4 fix: reorder silently broke plan eligibility).
            from graph_hscn_tpu.parallel.edge_partition import \
                sort_edges_by_receiver
            snd, rcv, em, eo = sort_edges_by_receiver(snd, rcv, em, n)
        plan_np = plan_halo_exchange(snd, rcv, em, n, D)
        if reorder:
            # Stored per-edge indices now address the sorted order;
            # compose back to the batch's original edge positions so
            # edge-feature gathers stay correct.
            plan_np["eidx_loc"] = eo[plan_np["eidx_loc"]]
            plan_np["eidx_hal"] = eo[plan_np["eidx_hal"]]
        logger.info(f"[edge-partition] {split}: {n} node rows over {D} "
                    f"devices, halo width H={plan_np['halo_width']}"
                    f"{' (locality-reordered)' if reorder else ''}")
        # eidx_* are host-side edge-feature gather indices — never upload.
        plan = {k: jnp.asarray(v) for k, v in plan_np.items()
                if k not in ("block_size", "halo_width",
                             "eidx_loc", "eidx_hal")}
        if conv in ("gcn", "gat", "gatedgcn") and pallas_enabled():
            from graph_hscn_tpu.parallel.edge_partition import \
                local_spmm_plans
            sp = local_spmm_plans(plan_np, plan_np["block_size"])
            if sp is not None:
                plan["spmm_loc"] = sp
        xb, yb, okb = shard_node_blocks(mesh, D, x, y, node_ok)
        if conv == "gps":
            # Ring attention needs graph ids (per-graph attention mask)
            # and the node mask as rotating K/V side-channels.
            (plan["gid_blocks"],) = shard_node_blocks(mesh, D, gid)
            plan["ok_blocks"] = okb
        gps_gated = (conv == "gps" and getattr(
            mpnn_cfg, "gps_local_conv", "gcn").lower() == "gatedgcn")
        if conv == "gatedgcn" or gps_gated:
            plan["ok_blocks"] = okb
            if b.edge_feat is not None:
                from graph_hscn_tpu.parallel.sharded_gatedgcn import \
                    gather_edge_groups
                el, eh = gather_edge_groups(b.edge_feat, plan_np)
                from graph_hscn_tpu.parallel.edge_partition import \
                    shard_arrays
                plan["e_loc"], plan["e_hal"] = shard_arrays(mesh, el, eh)
        pb = SimpleNamespace(num_nodes_padded=n, node_mask=node_ok,
                             node_y=y, edge_mask=em)
        return pb, plan, xb, yb, okb

    splits = {name: packed(name) for name in ("train", "val", "test")}
    # Pallas local aggregation only if EVERY split's blocks admit plans
    # (one shard_map program serves all splits).
    if dtype is not None:
        logger.info("[edge-partition] mixed precision: bf16 compute + "
                    "halo payloads, f32 params/logits.")
    # bf16 composes with the plan path (kernel takes bf16 operands with
    # f32 MXU accumulation) — no dtype restriction.
    use_spmm_plan = conv in ("gcn", "gat", "gatedgcn") and all(
        "spmm_loc" in s[1] for s in splits.values())
    if not use_spmm_plan:
        for s in splits.values():
            s[1].pop("spmm_loc", None)
    else:
        logger.info("[edge-partition] local aggregation: fused Pallas "
                    "SpMM on per-device blocks")
    dims = ([dm.num_features]
            + [mpnn_cfg.hidden_channels] * (mpnn_cfg.num_layers - 1)
            + [dm.num_classes])
    if conv == "gps":
        # Ring-attention GPS (parallel/sharded_gps.py): the CP analog —
        # global per-graph attention with K/V blocks rotating over the
        # mesh axis.  Layer count = num_layers GPS blocks at constant
        # hidden width (input/head projections handle F and C).
        from graph_hscn_tpu.parallel.sharded_gps import (
            init_sharded_gps_params, make_sharded_gps)
        gps_local = getattr(mpnn_cfg, "gps_local_conv", "gcn").lower()
        edge_dim = (splits["train"][1]["e_loc"].shape[-1]
                    if "e_loc" in splits["train"][1] else None)
        params = init_sharded_gps_params(
            jax.random.PRNGKey(training_cfg.seed), dm.num_features,
            mpnn_cfg.hidden_channels, dm.num_classes,
            mpnn_cfg.num_layers, mpnn_cfg.num_heads,
            local_conv=gps_local, edge_features=edge_dim)
        _fw, _vg_gps = make_sharded_gps(mesh, mpnn_cfg.num_layers,
                                        mpnn_cfg.num_heads, axis=axis,
                                        dtype=dtype, dropout=drop,
                                        local_conv=gps_local)

        def forward(p, xb, plan):
            return _fw(p, xb, plan["gid_blocks"], plan["ok_blocks"], plan)

        def value_and_grad(p, xb, plan, yb, okb, key=None):
            return _vg_gps(p, xb, plan["gid_blocks"], plan["ok_blocks"],
                           plan, yb, key=key)
    elif conv == "gatedgcn":
        # Edge-featured gated message passing; edge state is resident on
        # the receiver's device for the whole run (parallel/
        # sharded_gatedgcn.py) — per-layer comms = the node-feature halo.
        from graph_hscn_tpu.parallel.sharded_gatedgcn import (
            init_sharded_gatedgcn_params, make_sharded_gatedgcn)
        edge_dim = (splits["train"][1]["e_loc"].shape[-1]
                    if "e_loc" in splits["train"][1] else None)
        params = init_sharded_gatedgcn_params(
            jax.random.PRNGKey(training_cfg.seed), dm.num_features,
            edge_dim, mpnn_cfg.hidden_channels, dm.num_classes,
            mpnn_cfg.num_layers)
        _fw_g, _vg_g = make_sharded_gatedgcn(mesh, mpnn_cfg.num_layers,
                                             axis=axis,
                                             use_spmm_plan=use_spmm_plan,
                                             dtype=dtype, dropout=drop)

        def forward(p, xb, plan):
            return _fw_g(p, xb, plan.get("e_loc"), plan.get("e_hal"),
                         plan["ok_blocks"], plan)

        def value_and_grad(p, xb, plan, yb, okb, key=None):
            return _vg_g(p, xb, plan.get("e_loc"), plan.get("e_hal"),
                         plan["ok_blocks"], plan, yb, key=key)
    elif conv == "gcn":
        params = init_sharded_gcn_params(
            jax.random.PRNGKey(training_cfg.seed), dims)
        forward, value_and_grad = make_sharded_gcn(
            mesh, num_layers=len(dims) - 1, axis=axis,
            use_spmm_plan=use_spmm_plan, dtype=dtype, dropout=drop)
    elif conv == "gat":
        params = init_sharded_gat_params(
            jax.random.PRNGKey(training_cfg.seed), dims,
            heads=mpnn_cfg.num_heads)
        forward, value_and_grad = make_sharded_gat(
            mesh, num_layers=len(dims) - 1, axis=axis,
            use_spmm_plan=use_spmm_plan, dropout=drop, dtype=dtype)
    elif conv == "gin":
        params = init_sharded_gin_params(
            jax.random.PRNGKey(training_cfg.seed), dims)
        forward, value_and_grad = make_sharded_gin(
            mesh, num_layers=len(dims) - 1, axis=axis, dtype=dtype,
            dropout=drop)
    else:
        raise ValueError("edge-partitioned path supports conv_type gcn, "
                         f"gat, gin, gatedgcn or gps, got "
                         f"{mpnn_cfg.conv_type!r}")
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
        b, plan, xb, yb, okb = splits[split]
        logits = np.asarray(forward(params, xb, plan)).reshape(
            b.num_nodes_padded, -1)
        mask = np.asarray(b.node_mask)
        y = np.asarray(b.node_y)
        logp = jax.nn.log_softmax(jnp.asarray(logits[mask]), axis=-1)
        loss = float(-jnp.mean(jnp.sum(jnp.asarray(y[mask]) * logp, -1)))
        return loss, metric_fn(y[mask], logits[mask])

    if eval_only:
        # Eval-only mode: restore a snapshot and score val/test (the
        # sharded analog of train.loop.evaluate_checkpoint).
        state, meta = checkpointer.restore(eval_only, get_state())
        params = state.params
        results = {}
        for split in ("val", "test"):
            loss, perf = evaluate_any(split)
            results[split] = {"loss": loss, training_cfg.metric: perf}
            if predictions_sink is not None:
                b, plan, xb, _, _ = splits[split]
                logits = np.asarray(forward(params, xb, plan)).reshape(
                    b.num_nodes_padded, -1)
                mask = np.asarray(b.node_mask)
                predictions_sink[split] = {
                    "scores": logits[mask],
                    "targets": np.asarray(b.node_y)[mask]}
        return results, meta

    state0, start_epoch, best_loss = _maybe_resume(get_state(),
                                                   checkpointer, logger)
    params, opt_state = state0.params, state0.opt_state

    b_tr, plan_tr, xb, yb, okb = splits["train"]
    train_edges = int(np.asarray(b_tr.edge_mask).sum())

    def train_epoch(epoch):
        nonlocal params, opt_state
        kw = {}
        if drop > 0.0:
            # One replicated step key; devices fold in their mesh index.
            kw["key"] = jax.random.fold_in(
                jax.random.PRNGKey(training_cfg.seed), epoch)
        loss, grads = value_and_grad(params, xb, plan_tr, yb, okb, **kw)
        params, opt_state = apply_updates(params, opt_state, grads)
        eval_now = is_eval_epoch(epoch, training_cfg.epochs,
                                 training_cfg.eval_period)
        # Train metric needs its own forward pass: eval epochs only.
        perf = evaluate_any("train")[1] if eval_now else float("nan")
        return float(loss), perf, train_edges

    return run_fit_loop(training_cfg, logger, checkpointer, train_epoch,
                        evaluate_any, get_state, start_epoch=start_epoch,
                        best_loss=best_loss)


def init_sharded_gin_params(rng, dims: list[int]) -> list[dict]:
    """GIN stack params: per layer a 2-layer MLP (models/layers.GINConv
    with train_eps=False — eps is the constant 0)."""
    params = []
    for i in range(len(dims) - 1):
        rng, k1, k2 = jax.random.split(rng, 3)
        f_out = dims[i + 1]
        s1 = jnp.sqrt(6.0 / (dims[i] + f_out))
        s2 = jnp.sqrt(6.0 / (f_out + f_out))
        params.append({
            "w1": jax.random.uniform(k1, (dims[i], f_out),
                                     minval=-s1, maxval=s1),
            "b1": jnp.zeros((f_out,)),
            "w2": jax.random.uniform(k2, (f_out, f_out),
                                     minval=-s2, maxval=s2),
            "b2": jnp.zeros((f_out,)),
        })
    return params


def make_sharded_gin(mesh: Mesh, num_layers: int, axis: str = "data",
                     shard_axes=None, grad_axes=None, dtype=None,
                     dropout: float = 0.0):
    """Edge-partitioned GIN:  x' = MLP((1 + eps) x + sum_j x_j) with
    eps = 0 (models/layers.GINConv semantics), unweighted sum aggregation
    over the same receiver-owned halo layout as the sharded GCN, ReLU
    between layers.  Same (forward, value_and_grad) contract."""
    shard_axes = shard_axes if shard_axes is not None else axis
    grad_axes = grad_axes if grad_axes is not None else axis
    has_key = dropout > 0.0

    def per_device_forward(params, x_blk, send_idx, snd_loc, rcv_loc,
                           m_loc, snd_hal, rcv_hal, m_hal, key=None):
        x = x_blk[0]
        send_idx = send_idx[0]
        snd_loc, rcv_loc, m_loc = snd_loc[0], rcv_loc[0], m_loc[0]
        snd_hal, rcv_hal, m_hal = snd_hal[0], rcv_hal[0], m_hal[0]
        nb = x.shape[0]
        if dtype is not None:
            x = x.astype(dtype)

        h = x
        for li, layer in enumerate(params):
            w1, b1, w2, b2 = (layer[k] for k in ("w1", "b1", "w2", "b2"))
            if dtype is not None:
                w1, b1, w2, b2 = (a.astype(dtype)
                                  for a in (w1, b1, w2, b2))
            halo = _halo(h, send_idx, axis)
            agg = segment_sum(
                jnp.where(m_loc[:, None], h[snd_loc], 0.0), rcv_loc, nb)
            agg = agg + segment_sum(
                jnp.where(m_hal[:, None], halo[snd_hal], 0.0), rcv_hal,
                nb)
            h = h + agg                       # (1 + eps) x + sum, eps = 0
            h = jax.nn.relu(h @ w1 + b1) @ w2 + b2
            if layer is not params[-1]:
                h = jax.nn.relu(h)
                if key is not None:
                    h = _dropout(h, key, li, dropout)
        return h.astype(jnp.float32)[None]

    forward = jax.jit(jax.shard_map(
        per_device_forward, mesh=mesh,
        in_specs=(P(),) + (P(shard_axes),) * 8,
        out_specs=P(shard_axes),
        check_vma=False,
    ))

    def per_device_value_grad(params, x_blk, send_idx, snd_loc, rcv_loc,
                              m_loc, snd_hal, rcv_hal, m_hal, y_blk,
                              node_ok_blk, gcnt, *rest):
        key = _device_key(rest[0], shard_axes) if has_key else None

        def local_loss(params):
            logits = per_device_forward(
                params, x_blk, send_idx, snd_loc, rcv_loc, m_loc,
                snd_hal, rcv_hal, m_hal, key=key)[0]
            y = y_blk[0]
            ok = node_ok_blk[0].astype(logits.dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
            return jnp.sum(per * ok) / gcnt

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, grad_axes)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, grad_axes), grads)
        return loss, grads

    _vg = jax.jit(jax.shard_map(
        per_device_value_grad, mesh=mesh,
        in_specs=(P(),) + (P(shard_axes),) * 10 + (None,)
        + ((P(),) if has_key else ()),
        out_specs=(P(), P()),
        check_vma=False,
    ), static_argnums=(11,))

    def forward_wrapper(params, x_blocks, plan):
        return forward(params, x_blocks, *(plan[k] for k in _PLAN_KEYS))

    def value_and_grad(params, x_blocks, plan, y_blocks, node_ok_blocks,
                       key=None):
        gcnt = float(np.maximum(np.asarray(node_ok_blocks).sum(), 1.0))
        if has_key and key is None:
            raise ValueError(
                "dropout > 0 training steps need a fresh per-step PRNG "
                "key (see make_sharded_gcn.value_and_grad)")
        extras = ((key,) if has_key else ())
        return _vg(params, x_blocks, *(plan[k] for k in _PLAN_KEYS),
                   y_blocks, node_ok_blocks, gcnt, *extras)

    return forward_wrapper, value_and_grad


def init_sharded_gat_params(rng, dims: list[int],
                            heads: int = 1) -> list[dict]:
    """GAT stack params (kernel [F_in, H*C], att_src/att_dst [H, C],
    bias).  Head layout mirrors models/mpnn.py: hidden layers have
    C = width // H and CONCATENATE heads; the output layer has
    C = num_classes and AVERAGES heads (concat=False)."""
    params = []
    for i in range(len(dims) - 1):
        last = i == len(dims) - 2
        C = dims[i + 1] if last else dims[i + 1] // heads
        assert last or dims[i + 1] % heads == 0
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        scale = jnp.sqrt(6.0 / (dims[i] + heads * C))
        a_scale = jnp.sqrt(6.0 / (1 + C))
        params.append({
            "kernel": jax.random.uniform(k1, (dims[i], heads * C),
                                         minval=-scale, maxval=scale),
            "att_src": jax.random.uniform(k2, (heads, C),
                                          minval=-a_scale, maxval=a_scale),
            "att_dst": jax.random.uniform(k3, (heads, C),
                                          minval=-a_scale, maxval=a_scale),
            "bias": jnp.zeros((dims[i + 1] if last
                               else heads * C,)),
        })
    return params


def make_sharded_gat(mesh: Mesh, num_layers: int, axis: str = "data",
                     negative_slope: float = 0.2,
                     use_spmm_plan: bool = False, shard_axes=None,
                     grad_axes=None, dropout: float = 0.0, dtype=None):
    """Edge-partitioned multi-head GAT (PyG semantics incl. the self edge
    in each node's softmax, matching models.layers.GATConv with
    add_self_loops=True).

    Because edges are receiver-owned (parallel/edge_partition.py), every
    incoming edge of an owned node lives on its owner device, so the
    attention softmax is LOCAL — only sender features cross devices, via
    the same per-layer targeted all_to_all as the sharded GCN.  Halo
    senders' attention logits are computed from the received halo features
    (no extra exchange).  ReLU between layers mirrors the MPNN stack.

    ``shard_axes``/``grad_axes``: see make_sharded_gcn (hybrid 2-D meshes).

    ``dtype`` (e.g. jnp.bfloat16): mixed precision — params stay f32
    masters, transformed features and the per-layer halo payload run in
    ``dtype`` (halved all_to_all bytes); attention logits / exp / softmax
    denominators stay f32 for stability; logits return f32.  Composes
    with ``use_spmm_plan`` (spmm_mh takes bf16 operands, f32 MXU
    accumulation).
    """
    n_extra = 1 if use_spmm_plan else 0
    shard_axes = shard_axes if shard_axes is not None else axis
    grad_axes = grad_axes if grad_axes is not None else axis
    has_key = dropout > 0.0   # training programs carry a PRNG step key

    def per_device_forward(params, x_blk, send_idx, snd_loc, rcv_loc,
                           m_loc, snd_hal, rcv_hal, m_hal, *sp, key=None):
        x = x_blk[0]
        send_idx = send_idx[0]
        snd_loc, rcv_loc, m_loc = snd_loc[0], rcv_loc[0], m_loc[0]
        snd_hal, rcv_hal, m_hal = snd_hal[0], rcv_hal[0], m_hal[0]
        nb = x.shape[0]
        local_agg_mh = _make_local_agg_mh(sp, snd_loc, rcv_loc, nb,
                                          use_spmm_plan)
        if dtype is not None:
            x = x.astype(dtype)
        neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

        h = x
        for li, layer in enumerate(params):
            H, C = layer["att_src"].shape
            last = layer is params[-1]
            kernel = layer["kernel"]
            if dtype is not None:
                kernel = kernel.astype(dtype)
            z = h @ kernel                             # [Nb, H*C]
            # Exchange transformed sender features; local attention math
            # overlaps with the in-flight all_to_all.
            halo = _halo(z, send_idx, axis)
            zh = z.reshape(nb, H, C)
            halo_h = halo.reshape(-1, H, C)
            # Attention logits + softmax in f32 regardless of dtype.
            zh32 = zh.astype(jnp.float32)
            halo32 = halo_h.astype(jnp.float32)
            a_src = jnp.sum(zh32 * layer["att_src"][None], -1)  # [Nb, H]
            a_dst = jnp.sum(zh32 * layer["att_dst"][None], -1)
            a_src_halo = jnp.sum(halo32 * layer["att_src"][None], -1)

            e_loc = jax.nn.leaky_relu(a_src[snd_loc] + a_dst[rcv_loc],
                                      negative_slope)          # [El, H]
            e_hal = jax.nn.leaky_relu(a_src_halo[snd_hal] + a_dst[rcv_hal],
                                      negative_slope)
            e_self = jax.nn.leaky_relu(a_src + a_dst, negative_slope)
            e_loc = jnp.where(m_loc[:, None], e_loc, neg_inf)
            e_hal = jnp.where(m_hal[:, None], e_hal, neg_inf)

            seg_max = jnp.maximum(
                jax.ops.segment_max(e_loc, rcv_loc, nb),
                jax.ops.segment_max(e_hal, rcv_hal, nb))
            m = jnp.maximum(jnp.where(jnp.isfinite(seg_max), seg_max,
                                      neg_inf), e_self)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            exp_loc = jnp.where(m_loc[:, None],
                                jnp.exp(e_loc - m[rcv_loc]), 0.0)
            exp_hal = jnp.where(m_hal[:, None],
                                jnp.exp(e_hal - m[rcv_hal]), 0.0)
            exp_self = jnp.exp(e_self - m)
            denom = (segment_sum(exp_loc, rcv_loc, nb)
                     + segment_sum(exp_hal, rcv_hal, nb) + exp_self)
            denom = jnp.maximum(denom, 1e-16)               # [Nb, H]

            # ALL heads aggregated in one kernel launch (spmm_mh; the
            # blocked SDDMM supplies d(exp) in its VJP), matching the
            # single-device GATConv.aggregate rework.  Under mixed
            # precision the message weights rejoin dtype (softmax math
            # above stayed f32); denominators divide in f32.
            wl, wh, wself = exp_loc, exp_hal, exp_self
            bias = layer["bias"]
            if dtype is not None:
                wl, wh, wself = (exp_loc.astype(dtype),
                                 exp_hal.astype(dtype),
                                 exp_self.astype(dtype))
                bias = bias.astype(dtype)
            agg = local_agg_mh(zh, wl, H)                   # [Nb, H, C]
            agg = agg + segment_sum(
                halo_h[snd_hal] * wh[..., None], rcv_hal, nb)
            out = ((agg + zh * wself[..., None]).astype(jnp.float32)
                   / denom[..., None])
            if dtype is not None:
                out = out.astype(dtype)
            # Hidden layers concatenate heads; the output layer averages
            # (models/mpnn.py head layout).  Identical for H = 1.
            out = out.mean(axis=1) if last else out.reshape(nb, H * C)
            h = out + bias
            if not last:
                h = jax.nn.relu(h)
                if key is not None:
                    h = _dropout(h, key, li, dropout)
        return h.astype(jnp.float32)[None]

    forward = jax.jit(jax.shard_map(
        per_device_forward, mesh=mesh,
        in_specs=(P(),) + (P(shard_axes),) * (8 + n_extra),
        out_specs=P(shard_axes),
        check_vma=False,
    ))

    def per_device_value_grad(params, x_blk, send_idx, snd_loc, rcv_loc,
                              m_loc, snd_hal, rcv_hal, m_hal, y_blk,
                              node_ok_blk, gcnt, *rest):
        if has_key:
            key, *sp = rest
            key = _device_key(key, shard_axes)
        else:
            key, sp = None, rest

        def local_loss(params):
            logits = per_device_forward(
                params, x_blk, send_idx, snd_loc, rcv_loc, m_loc,
                snd_hal, rcv_hal, m_hal, *sp, key=key)[0]
            y = y_blk[0]
            ok = node_ok_blk[0].astype(logits.dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
            return jnp.sum(per * ok) / gcnt

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, grad_axes)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, grad_axes), grads)
        return loss, grads

    _vg = jax.jit(jax.shard_map(
        per_device_value_grad, mesh=mesh,
        in_specs=(P(),) + (P(shard_axes),) * 10 + (None,)
        + ((P(),) if has_key else ())
        + (P(shard_axes),) * n_extra,
        out_specs=(P(), P()),
        check_vma=False,
    ), static_argnums=(11,))

    def _extras(plan):
        return (plan["spmm_loc"],) if use_spmm_plan else ()

    def value_and_grad(params, x_blocks, plan, y_blocks, node_ok_blocks,
                       key=None):
        gcnt = float(np.maximum(np.asarray(node_ok_blocks).sum(), 1.0))
        extras = _extras(plan)
        if has_key:
            if key is None:
                raise ValueError(
                    "dropout > 0 training steps need a fresh per-step "
                    "PRNG key (see make_sharded_gcn.value_and_grad)")
            extras = (key,) + extras
        return _vg(params, x_blocks, *(plan[k] for k in _PLAN_KEYS),
                   y_blocks, node_ok_blocks, gcnt, *extras)

    def forward_wrapper(params, x_blocks, plan):
        return forward(params, x_blocks, *(plan[k] for k in _PLAN_KEYS),
                       *_extras(plan))

    return forward_wrapper, value_and_grad
