"""Edge-partitioned SCN (stage-1 MinCUT clustering) + the full sharded
HSCN pipeline for giant graphs.

The reference's HSCN pipeline (main.py:100-119) is strictly single-device:
SCN clustering (train_clustering.py:20-70), host-side hetero rewrite, then
HSCN training.  parallel/sharded_hscn.py already provides the stage-4
hetero conv over an edge-partitioned mesh; this module supplies the missing
stage 1 — the SCN's GraphConv stack and the relaxed MinCUT objective
computed over node blocks sharded across devices — and a CLI-reachable
``fit_hscn_edge_partitioned`` that runs the whole pipeline on a node-level
task packed as ONE giant batch (``hscn:`` + ``mesh.edge_partition: true``).

Sharding layout (parallel/edge_partition.py): contiguous node blocks,
receiver-owned edges, targeted all_to_all halo exchange per layer.  The
MinCUT losses are *global graph* semantics (one set of K clusters over the
whole node space — the giant-graph regime the sharded HSCN's replicated
virtual nodes assume), realized as per-device contractions + K-sized psums:

    S^T A S   local s_blk.T @ (A_local s), summed across blocks   [K, K]
    tr(S^T D S)  sum_i outdeg_i ||s_i||^2 across blocks  (out-degree is
                 static graph structure, computed host-side at plan time)
    S^T S     local gram, summed across blocks                   [K, K]

Gradient note: the MinCUT loss is a NONLINEAR function of globally-reduced
contractions; differentiating a replicated in-shard_map loss through psum
under ``check_vma=False`` produces wrong cotangents (empirically — the
psum transpose does not see the replication).  The correct structure used
here: the shard_map program returns per-device PARTIAL contractions (no
psum), the loss closes over their cross-device sum in plain jit, and
``jax.value_and_grad`` differentiates *through* the shard_map — every
collective inside (the all_to_all halo exchanges) has an exact transpose.
Verified against jax.grad of the flax SCN with mapped weights in
tests/test_sharded_scn.py.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from graph_hscn_tpu.models.layers import ACTIVATIONS
from graph_hscn_tpu.ops.segment import segment_sum
from graph_hscn_tpu.ops.spmm import pallas_enabled

_PLAN_KEYS = ("send_idx", "snd_loc", "rcv_loc", "mask_loc",
              "snd_hal", "rcv_hal", "mask_hal")


def init_sharded_scn_params(rng, num_features: int, mp_units, num_clusters):
    """GraphConv-stack + Dense-head params mirroring models/scn.py's flax
    SCN (GraphConv kernel_rel/kernel_root/bias, head Dense to K logits)."""
    def glorot(key, shape):
        scale = jnp.sqrt(6.0 / (shape[0] + shape[1]))
        return jax.random.uniform(key, shape, minval=-scale, maxval=scale)

    layers = []
    f_in = num_features
    for units in mp_units:
        rng, k1, k2 = jax.random.split(rng, 3)
        layers.append({
            "kernel_rel": glorot(k1, (f_in, units)),
            "kernel_root": glorot(k2, (f_in, units)),
            "bias": jnp.zeros((units,)),
        })
        f_in = units
    rng, k = jax.random.split(rng)
    head = {"kernel": glorot(k, (f_in, num_clusters)),
            "bias": jnp.zeros((num_clusters,))}
    return {"layers": layers, "head": head}


def make_sharded_scn(mesh: Mesh, num_clusters: int, mp_act: str = "relu",
                     axis: str = "data", use_spmm_plan: bool = False,
                     dtype=None):
    """Builds (losses, value_and_grad, assign) over the mesh.

    losses(params, x_blocks, mask_blocks, outdeg_blocks, plan)
        -> (mc_loss, ortho_loss) replicated scalars.
    value_and_grad(...) -> (mc + ortho, grads) — grads replicated (see
        module docstring on the psum-transpose convention).
    assign(...) -> argmax cluster ids [D, Nb] int32.

    Semantics match models/scn.py's sparse path: GraphConv message passing
    on GCN-normalized weights incl. the folded self-loop diagonal
    (gcn_norm_weights, reference train_clustering.py:37-47), MinCUT on the
    RAW unweighted adjacency (quirk #7 parity, reference hscn.py:61-63).

    ``use_spmm_plan``: the plan dict carries ``spmm_loc``
    (edge_partition.local_spmm_plans); the GraphConv local-sender
    aggregation AND the A·S contraction of the MinCUT numerator then ride
    the fused Pallas SpMM on each device's block (VERDICT round-3 item 2),
    same plan the stage-4 sharded HSCN reuses.

    ``dtype`` (e.g. jnp.bfloat16): mixed precision on the GraphConv stack
    (features + halo payloads in dtype, f32 params); the assignment
    logits, softmax, and every MinCUT contraction stay f32 — the losses
    are ratios of globally-reduced traces and numerically f32-sensitive.
    """
    from graph_hscn_tpu.parallel.sharded_gcn import _make_local_agg
    K = num_clusters
    act = ACTIVATIONS[mp_act.lower()]
    n_extra = 1 if use_spmm_plan else 0

    def _halo(x_blk, send_idx):
        outbound = jnp.take(x_blk, send_idx, axis=0)        # [D, H, F]
        inbound = jax.lax.all_to_all(outbound, axis, split_axis=0,
                                     concat_axis=0, tiled=False)
        return inbound.reshape(-1, x_blk.shape[-1])

    def core(params, x, mask, outdeg, send_idx, snd_loc, rcv_loc, m_loc,
             snd_hal, rcv_hal, m_hal, sp=()):
        nb = x.shape[0]
        # Structural weights (degree norm / raw adjacency): kernel VJP
        # skips its dw SDDMM on both uses.
        local_agg = _make_local_agg(sp, snd_loc, rcv_loc, nb,
                                    use_spmm_plan, weight_grad=False)
        # gcn_norm: in-degree over real edges + 1 self loop (receiver-owned
        # edges make the in-degree fully local); sender-side dinv may be
        # remote — exchanged once (layer-independent).
        deg = (segment_sum(jnp.where(m_loc, 1.0, 0.0), rcv_loc, nb)
               + segment_sum(jnp.where(m_hal, 1.0, 0.0), rcv_hal, nb)
               + 1.0)
        dinv = jax.lax.rsqrt(deg)
        dinv_halo = _halo(dinv[:, None], send_idx)[:, 0]
        w_loc = jnp.where(m_loc, dinv[snd_loc] * dinv[rcv_loc], 0.0)
        w_hal = jnp.where(m_hal, dinv_halo[snd_hal] * dinv[rcv_hal], 0.0)
        diag = dinv * dinv

        h = x
        if dtype is not None:
            h = h.astype(dtype)
            w_loc, w_hal, diag = (w_loc.astype(dtype),
                                  w_hal.astype(dtype), diag.astype(dtype))

        def _p(t):
            return t.astype(dtype) if dtype is not None else t

        for layer in params["layers"]:
            # Issue the exchange first; local-sender aggregation runs while
            # the all_to_all is in flight (same overlap as sharded_gcn;
            # Pallas SpMM on this block when a plan is attached).
            halo_h = _halo(h, send_idx)
            agg = local_agg(h, w_loc)
            agg = agg + segment_sum(halo_h[snd_hal] * w_hal[:, None],
                                    rcv_hal, nb)
            agg = agg + diag[:, None] * h
            h = (agg @ _p(layer["kernel_rel"]) + h @ _p(layer["kernel_root"])
                 + _p(layer["bias"]))
            h = act(h)
        # Assignment logits + all MinCUT math in f32 (loss ratios of
        # globally-reduced traces).
        s_logits = (h.astype(jnp.float32) @ params["head"]["kernel"]
                    + params["head"]["bias"])

        # PARTIAL MinCUT contractions on the raw unweighted adjacency
        # (quirk #7), masked like ops/dense.mincut_pool.  No psum — the
        # cross-device sum and the nonlinear loss live OUTSIDE shard_map
        # so AD through the program stays exact (module docstring).
        s = jax.nn.softmax(s_logits, axis=-1)
        s = s * jnp.where(mask, 1.0, 0.0)[:, None]
        s_halo = _halo(s, send_idx)
        a_s = local_agg(s, jnp.where(m_loc, 1.0, 0.0))
        a_s = a_s + segment_sum(
            jnp.where(m_hal[:, None], s_halo[snd_hal], 0.0), rcv_hal, nb)
        stas_part = s.T @ a_s                                 # [K, K]
        den_part = jnp.sum(outdeg * jnp.sum(s * s, -1))       # scalar
        ss_part = s.T @ s                                     # [K, K]
        return s_logits, stas_part, den_part, ss_part

    def _unblk(args):
        return tuple(a[0] for a in args)

    n_base = 10  # x, mask, outdeg + 7 plan arrays

    n_in = n_base + n_extra

    def _mk_parts():
        # One shard_map instance per enclosing jit: reusing a single
        # instance under two different outer traces retains trace-local
        # constants on the Pallas interpret path (UnexpectedTracerError
        # with use_spmm_plan; losses vs value_and_grad jits).
        def per_device_parts(params, *args):
            base, sp = args[:n_base], args[n_base:]
            _, stas, den, ss = core(params, *_unblk(base), sp)
            return stas[None], den[None], ss[None]

        return jax.shard_map(
            per_device_parts, mesh=mesh,
            in_specs=(P(),) + (P(axis),) * n_in,
            out_specs=(P(axis), P(axis), P(axis)), check_vma=False)

    def per_device_assign(params, *args):
        base, sp = args[:n_base], args[n_base:]
        s_logits, _, _, _ = core(params, *_unblk(base), sp)
        return jnp.argmax(s_logits, -1).astype(jnp.int32)[None]

    _parts = _mk_parts()
    _parts_vg = _mk_parts()
    _assign = jax.jit(jax.shard_map(
        per_device_assign, mesh=mesh,
        in_specs=(P(),) + (P(axis),) * n_in,
        out_specs=P(axis), check_vma=False))

    def _args(x_blocks, mask_blocks, outdeg_blocks, plan):
        extras = (plan["spmm_loc"],) if use_spmm_plan else ()
        return (x_blocks, mask_blocks, outdeg_blocks,
                *(plan[k] for k in _PLAN_KEYS), *extras)

    def _losses_of(params, *args, parts=None):
        stas_p, den_p, ss_p = (parts or _parts)(params, *args)
        stas = jnp.sum(stas_p, axis=0)
        den = jnp.sum(den_p)
        ss = jnp.sum(ss_p, axis=0)
        mc = -(jnp.trace(stas) / jnp.maximum(den, 1e-12))
        ss_norm = jnp.linalg.norm(ss)
        ident = jnp.eye(K, dtype=ss.dtype) / jnp.sqrt(
            jnp.asarray(K, ss.dtype))
        o = jnp.linalg.norm(ss / jnp.maximum(ss_norm, 1e-12) - ident)
        return mc, o

    @jax.jit
    def _losses_jit(params, *args):
        return _losses_of(params, *args)

    @jax.jit
    def _vg_jit(params, *args):
        def loss_fn(p):
            mc, o = _losses_of(p, *args, parts=_parts_vg)
            return mc + o

        return jax.value_and_grad(loss_fn)(params)

    def losses(params, x_blocks, mask_blocks, outdeg_blocks, plan):
        return _losses_jit(params, *_args(x_blocks, mask_blocks,
                                          outdeg_blocks, plan))

    def value_and_grad(params, x_blocks, mask_blocks, outdeg_blocks, plan):
        return _vg_jit(params, *_args(x_blocks, mask_blocks,
                                      outdeg_blocks, plan))

    def assign(params, x_blocks, mask_blocks, outdeg_blocks, plan):
        return _assign(params, *_args(x_blocks, mask_blocks,
                                      outdeg_blocks, plan))

    return losses, value_and_grad, assign


def fit_hscn_edge_partitioned(dm, mesh: Mesh, hscn_cfg, optim_cfg,
                              training_cfg, logger, checkpointer=None,
                              axis: str = "data", reorder: bool = True,
                              vv_pattern: str = "clique",
                              eval_only: str | None = None,
                              predictions_sink: dict | None = None,
                              dtype=None):
    """CLI-reachable giant-graph HSCN pipeline (``hscn:`` +
    ``mesh.edge_partition: true``): each split packed as ONE padded batch
    whose node blocks shard across the mesh, then

      stage 1  sharded SCN MinCUT clustering, trained full-batch on the
               whole dataset (train+val+test steps per epoch — reference
               main.py:107 clusters on the full dataset);
      stage 2  argmax cluster assignment per split;
      stage 3+4  sharded HSCN (parallel/sharded_hscn.py) supervised
               training with node-level softmax CE, same eval cadence /
               early-stop semantics as train.loop.fit.
    """
    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    from graph_hscn_tpu.parallel.edge_partition import (apply_node_reorder,
                                                        locality_reorder,
                                                        plan_halo_exchange)
    from graph_hscn_tpu.parallel.sharded_gcn import shard_node_blocks
    from graph_hscn_tpu.parallel.sharded_hscn import (
        init_sharded_hscn_params, make_sharded_hscn)
    from graph_hscn_tpu.train.loop import (TrainState, _maybe_resume,
                                           is_eval_epoch, run_fit_loop)
    from graph_hscn_tpu.train.metrics import METRICS
    from graph_hscn_tpu.train.optimizers import build_optimizer

    if training_cfg.loss_fn != "softmax_cross_entropy":
        raise ValueError(
            "edge-partitioned HSCN computes node-level softmax cross "
            "entropy; set loss_fn: softmax_cross_entropy")
    if dtype is not None:
        logger.info("[hscn-partition] mixed precision: bf16 streams + "
                    "halo payloads; MinCUT contractions, lv softmax "
                    "statistics, and logits stay f32.")
    D = int(np.prod(mesh.devices.shape))
    K = hscn_cfg.num_clusters
    metric_fn = METRICS[training_cfg.metric]

    def packed(split):
        graphs = dm.split(split)
        budget = PadBudget.for_dataset(graphs, batch_size=len(graphs),
                                       node_multiple=D * 8)
        b = pack_batch(graphs, budget)
        n = b.num_nodes_padded
        snd, rcv = np.asarray(b.senders), np.asarray(b.receivers)
        em = np.asarray(b.edge_mask)
        x, y = np.asarray(b.node_feat), np.asarray(b.node_y)
        node_ok = np.asarray(b.node_mask)
        if reorder:
            perm = locality_reorder(snd, rcv, em, n, node_mask=node_ok)
            snd, rcv, x, y, node_ok = apply_node_reorder(
                perm, snd, rcv, x, y, node_ok)
            # Receiver-sort invariant for the SpMM plans (round-4 fix).
            from graph_hscn_tpu.parallel.edge_partition import \
                sort_edges_by_receiver
            snd, rcv, em, _ = sort_edges_by_receiver(snd, rcv, em, n)
        # Out-degree (row-sum of the raw adjacency — mincut_pool's
        # denominator degree) is static graph structure: host-side.
        outdeg = np.bincount(snd[em], minlength=n).astype(np.float32)
        plan_np = plan_halo_exchange(snd, rcv, em, n, D)
        logger.info(f"[hscn-partition] {split}: {n} node rows over {D} "
                    f"devices, halo width H={plan_np['halo_width']}"
                    f"{' (locality-reordered)' if reorder else ''}")
        plan = {k: jnp.asarray(v) for k, v in plan_np.items()
                if k not in ("block_size", "halo_width",
                             "eidx_loc", "eidx_hal")}
        if pallas_enabled():
            # One plan serves stage 1 (SCN) and stage 4 (HSCN ll): both
            # aggregate the same local-sender edge groups.
            from graph_hscn_tpu.parallel.edge_partition import \
                local_spmm_plans
            sp = local_spmm_plans(plan_np, plan_np["block_size"])
            if sp is not None:
                plan["spmm_loc"] = sp
        xb, yb, okb, db = shard_node_blocks(mesh, D, x, y, node_ok, outdeg)
        return dict(n=n, plan=plan, xb=xb, yb=yb, okb=okb, db=db,
                    node_mask=node_ok, node_y=y,
                    edges=int(em.sum()))

    splits = {name: packed(name) for name in ("train", "val", "test")}
    # Pallas local aggregation only if EVERY split's blocks admit plans
    # (one shard_map program per stage serves all splits).
    use_spmm_plan = all("spmm_loc" in s["plan"] for s in splits.values())
    if not use_spmm_plan:
        for s in splits.values():
            s["plan"].pop("spmm_loc", None)
    else:
        logger.info("[hscn-partition] local aggregation: fused Pallas "
                    "SpMM on per-device blocks (SCN stack, MinCUT A*S, "
                    "HSCN ll relation)")

    # ---- Stage 1: sharded SCN clustering pre-train (full dataset). ----
    scn_losses, scn_vg, scn_assign = make_sharded_scn(
        mesh, K, mp_act=hscn_cfg.activation, axis=axis,
        use_spmm_plan=use_spmm_plan, dtype=dtype)
    scn_params = init_sharded_scn_params(
        jax.random.PRNGKey(training_cfg.seed), dm.num_features,
        list(hscn_cfg.mp_units), K)
    scn_tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                             optim_cfg.weight_decay)
    scn_opt = scn_tx.init(scn_params)

    @jax.jit
    def scn_apply(p, o, g):
        updates, o = scn_tx.update(g, o, p)
        return optax.apply_updates(p, updates), o

    for ep in range(hscn_cfg.cluster_epochs):
        t0 = time.time()
        losses = []
        for name in ("train", "val", "test"):
            s = splits[name]
            loss, grads = scn_vg(scn_params, s["xb"], s["okb"], s["db"],
                                 s["plan"])
            scn_params, scn_opt = scn_apply(scn_params, scn_opt, grads)
            losses.append(float(loss))
        mean_loss = float(np.mean(losses))
        logger.info(f"Clustering epoch {ep}: loss={mean_loss:.4f} "
                    f"({time.time() - t0:.2f}s)")
        logger.wandb_log({"cluster_loss": mean_loss})

    # ---- Stage 2: cluster assignment per split. ----
    for s in splits.values():
        s["cb"] = scn_assign(scn_params, s["xb"], s["okb"], s["db"],
                             s["plan"])

    # ---- Stage 3+4: sharded HSCN supervised training. ----
    heads = int(getattr(hscn_cfg, "num_heads", 1) or 1)
    params = init_sharded_hscn_params(
        jax.random.PRNGKey(training_cfg.seed), dm.num_features,
        hscn_cfg.hidden_channels, dm.num_classes, hscn_cfg.num_layers,
        heads=heads,
        virtual_feedback=getattr(hscn_cfg, "virtual_feedback", False))
    forward, value_and_grad = make_sharded_hscn(
        mesh, K, vv_pattern=vv_pattern, axis=axis, heads=heads,
        use_spmm_plan=use_spmm_plan, dtype=dtype)
    tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                         optim_cfg.weight_decay,
                         optim_cfg.batch_accumulation,
                         optim_cfg.clip_grad_norm,
                         schedule=getattr(optim_cfg, "schedule", "constant"),
                         warmup_steps=getattr(optim_cfg, "warmup_steps", 0),
                         total_steps=training_cfg.epochs)  # 1 step/epoch
    opt_state = tx.init(params)

    @jax.jit
    def apply_updates(p, o, g):
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o

    def get_state():
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.asarray(0, jnp.int32),
                          rng=jax.random.PRNGKey(training_cfg.seed))

    def evaluate_any(split):
        s = splits[split]
        logits = np.asarray(forward(params, s["xb"], s["okb"], s["cb"],
                                    s["plan"])).reshape(s["n"], -1)
        mask = s["node_mask"]
        y = s["node_y"]
        logp = jax.nn.log_softmax(jnp.asarray(logits[mask]), axis=-1)
        loss = float(-jnp.mean(jnp.sum(jnp.asarray(y[mask]) * logp, -1)))
        return loss, metric_fn(y[mask], logits[mask])

    if eval_only:
        # Eval-only: clusters were reconstructed deterministically above
        # (stage 1+2 re-run from training.seed — they are not part of the
        # snapshot, matching runner.run_eval's single-device HSCN); now
        # restore stage-4 weights and score.
        state, meta = checkpointer.restore(eval_only, get_state())
        params = state.params
        results = {}
        for split in ("val", "test"):
            loss, perf = evaluate_any(split)
            results[split] = {"loss": loss, training_cfg.metric: perf}
            if predictions_sink is not None:
                s = splits[split]
                logits = np.asarray(forward(
                    params, s["xb"], s["okb"], s["cb"],
                    s["plan"])).reshape(s["n"], -1)
                mask = s["node_mask"]
                predictions_sink[split] = {"scores": logits[mask],
                                           "targets": s["node_y"][mask]}
        return results, meta

    state0, start_epoch, best_loss = _maybe_resume(get_state(),
                                                   checkpointer, logger)
    params, opt_state = state0.params, state0.opt_state

    tr = splits["train"]

    def train_epoch(epoch):
        nonlocal params, opt_state
        loss, grads = value_and_grad(params, tr["xb"], tr["okb"], tr["cb"],
                                     tr["plan"], tr["yb"], tr["okb"])
        params, opt_state = apply_updates(params, opt_state, grads)
        eval_now = is_eval_epoch(epoch, training_cfg.epochs,
                                 training_cfg.eval_period)
        perf = evaluate_any("train")[1] if eval_now else float("nan")
        return float(loss), perf, tr["edges"]

    return run_fit_loop(training_cfg, logger, checkpointer, train_epoch,
                        evaluate_any, get_state, start_epoch=start_epoch,
                        best_loss=best_loss)
