"""Data-parallel training over a named mesh via shard_map.

Each device owns a full padded sub-batch (whole graphs — the batcher packs
device-aligned stacks, so no edge ever crosses a shard boundary).  The train
step runs per-device forward/backward locally; gradients and the loss
numerator/denominator are ``psum``-ed over the "data" axis, so the update
exactly equals the single-device update on the concatenated global batch —
this is what makes 1-chip vs N-chip training bitwise comparable (up to
reduction order).

The reference has no analog (single device, SURVEY §2.4); this is the
green-field DP design mandated by BASELINE.json.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_hscn_tpu.data.batching import GraphData, PadBudget, pack_batch
from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.train.loop import TrainState


def stack_device_batches(device_batches: list[GraphBatch]) -> GraphBatch:
    """[D] GraphBatches of identical shapes -> one GraphBatch with leading
    device axis on every array."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *device_batches)


def pack_for_devices(graphs: list[GraphData], num_devices: int,
                     budget: PadBudget, slot_nodes: int | None = None,
                     with_spmm_plan: bool = False) -> GraphBatch:
    """Round-robin graphs across devices, pack one sub-batch per device with
    the *same* per-device budget, stack along a leading device axis.
    Node-count load balancing, capped at the budget's graph capacity.
    ``slot_nodes``/``with_spmm_plan`` flow into pack_batch so the dense
    slotted and Pallas-plan execution paths work under DP too."""
    cap = budget.num_graphs - 1
    shards: list[list[GraphData]] = [[] for _ in range(num_devices)]
    order = np.argsort([-g.num_nodes for g in graphs])  # big-first balance
    loads = np.zeros(num_devices)
    for i in order:
        open_devs = [d for d in range(num_devices) if len(shards[d]) < cap]
        assert open_devs, (f"{len(graphs)} graphs exceed capacity "
                           f"{cap} * {num_devices} devices")
        d = min(open_devs, key=lambda d: loads[d])
        shards[d].append(graphs[int(i)])
        loads[d] += graphs[int(i)].num_nodes
    kw = dict(slot_nodes=slot_nodes, with_spmm_plan=with_spmm_plan)
    batches = [pack_batch(s, budget, **kw) if s
               else _empty_batch(graphs[0], budget, **kw)
               for s in shards]
    return stack_device_batches(batches)


def _empty_batch(proto: GraphData, budget: PadBudget,
                 slot_nodes: int | None = None,
                 with_spmm_plan: bool = False) -> GraphBatch:
    def node_field(name):
        v = getattr(proto, name)
        return None if v is None else np.zeros((1, v.shape[1]), np.float32)

    tiny = GraphData(
        x=node_field("x"),
        edge_index=np.zeros((2, 0), np.int64),
        y=None if proto.y is None else np.zeros_like(np.asarray(proto.y)),
        edge_attr=(None if proto.edge_attr is None
                   else np.zeros((0, proto.edge_attr.shape[1]), np.float32)),
        edge_weight=(None if proto.edge_weight is None
                     else np.zeros((0,), np.float32)),
        node_y=node_field("node_y"),
        node_pe=node_field("node_pe"),
        eigvals=node_field("eigvals"),
        eigvecs=node_field("eigvecs"),
        cluster=(None if proto.cluster is None
                 else np.zeros((1,), np.int32)),
    )
    b = pack_batch([tiny], budget, slot_nodes=slot_nodes,
                   with_spmm_plan=with_spmm_plan)
    # Mark the lone placeholder graph as padding.
    return b.replace(graph_mask=np.zeros_like(b.graph_mask),
                     node_mask=np.zeros_like(b.node_mask),
                     edge_mask=np.zeros_like(b.edge_mask))


def make_dp_train_step(model, tx, loss_fn: str, mesh: Mesh,
                       node_level: bool = False,
                       axis: str = "data") -> Callable:
    """Build the psum-reduced DP train step.  Input batch arrays carry a
    leading device axis sharded over ``axis``; params/opt_state replicated."""
    from graph_hscn_tpu.train.loss import criterion

    def per_elem(pred, true):
        """Per-element loss + score, same naming convention as
        train.loss.criterion ('cross_entropy' = BCE-with-logits,
        'softmax_cross_entropy' = softmax NLL, 'l1'/'mae' = L1)."""
        if loss_fn == "cross_entropy":
            per = (jnp.maximum(pred, 0) - pred * true
                   + jnp.log1p(jnp.exp(-jnp.abs(pred))))
            return per, jax.nn.sigmoid(pred)
        if loss_fn in ("l1", "mae"):
            return jnp.abs(pred - true), pred
        if loss_fn == "softmax_cross_entropy":
            logp = jax.nn.log_softmax(pred, axis=-1)
            per = -jnp.sum(true * logp, axis=-1, keepdims=True)
            return per, jax.nn.softmax(pred, axis=-1)
        raise ValueError(f"Unknown loss_fn {loss_fn}")

    def local_loss(params, batch: GraphBatch, rng, gcnt):
        """Local loss normalized by the *global* element count, with no
        collectives inside the differentiated region (JAX's
        psum-transpose-is-psum convention makes grad-through-psum scale by
        the device count; keeping collectives outside sidesteps it)."""
        pred = model.apply({"params": params}, batch, train=True,
                           rngs={"dropout": rng})
        if node_level:
            true, mask = batch.node_y, batch.node_mask
        else:
            true, mask = batch.y, batch.graph_mask
        per, score = per_elem(pred, true)
        m = mask[:, None].astype(pred.dtype)
        local_sum = jnp.sum(per * m)
        return local_sum / gcnt, (score, true, mask)

    def count_elems(batch: GraphBatch):
        mask = batch.node_mask if node_level else batch.graph_mask
        # softmax CE contributes one element per row; BCE/L1 one per class.
        width = (1 if loss_fn == "softmax_cross_entropy"
                 else (batch.node_y if node_level else batch.y).shape[-1])
        return jnp.sum(mask.astype(jnp.float32)) * width

    def per_device_step(state: TrainState, batch: GraphBatch):
        # Strip the leading device axis (length 1 inside shard_map).
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = jax.random.fold_in(state.rng, jax.lax.axis_index(axis))
        gcnt = jnp.maximum(
            jax.lax.psum(count_elems(batch), axis), 1.0)
        (loss, (score, true, mask)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(state.params, batch, rng, gcnt)
        # loss/grads hold only the local contribution; psum completes the
        # global mean (already normalized by the global count).
        loss = jax.lax.psum(loss, axis)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_rng = jax.random.split(state.rng)[0]
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=new_rng)
        return (new_state, loss, score[None], true[None], mask[None])

    state_spec = P()
    batch_spec = P(axis)
    step = jax.jit(
        jax.shard_map(
            per_device_step, mesh=mesh,
            in_specs=(state_spec, batch_spec),
            out_specs=(state_spec, state_spec, batch_spec, batch_spec,
                       batch_spec),
            check_vma=False,
        ))
    return step


def shard_stacked_batch(batch: GraphBatch, mesh: Mesh, axis: str = "data"
                        ) -> GraphBatch:
    """Device-put a stacked batch with leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def make_dp_eval_step(model, loss_fn: str, mesh: Mesh,
                      node_level: bool = False,
                      compat_sigmoid_score: bool = False,
                      axis: str = "data") -> Callable:
    """Psum-reduced DP eval step (loss via the shared criterion; scores
    gathered per device for host-side metric computation)."""
    from graph_hscn_tpu.train.loss import criterion

    def per_device(params, batch: GraphBatch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        pred = model.apply({"params": params}, batch, train=False)
        if node_level:
            true, mask = batch.node_y, batch.node_mask
        else:
            true, mask = batch.y, batch.graph_mask
        loss, score = criterion(loss_fn, pred, true, mask,
                                compat_sigmoid_score=compat_sigmoid_score)
        cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 0.0)
        num = jax.lax.psum(loss * cnt, axis)
        den = jnp.maximum(jax.lax.psum(cnt, axis), 1.0)
        return num / den, score[None], true[None], mask[None]

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P(axis), P(axis), P(axis)),
        check_vma=False,
    ))


def fit_dp(model, dm, mesh: Mesh, optim_cfg, training_cfg, logger,
           node_level: bool = False, compat_sigmoid_score: bool = False,
           checkpointer=None, axis: str = "data"):
    """Data-parallel training from the CLI (runner wires cfg.mesh here):
    same eval cadence / early-stop / checkpoint semantics as train.loop.fit
    but each step is one psum-reduced shard_map program over the mesh.

    Each global batch is ``batch_size`` graphs, load-balanced across the
    mesh's devices (pack_for_devices) with a per-device budget.  Per-device
    work shrinks as the mesh grows — scale ``batch_size`` with the mesh.

    Eval splits are packed + device_put ONCE (host->device transfer is
    expensive on this rig — CLAUDE.md); only train batches repack per
    epoch (they reshuffle)."""
    from graph_hscn_tpu.train.loop import (_maybe_resume, init_state,
                                           run_fit_loop)
    from graph_hscn_tpu.train.metrics import METRICS
    from graph_hscn_tpu.train.optimizers import build_optimizer

    D = int(np.prod(mesh.devices.shape))
    per_dev = max(1, -(-dm.batch_size // D))      # ceil(batch / D)
    budget = PadBudget.for_dataset(dm.graphs, per_dev)
    slot = dm.slot_nodes

    def batches(split: str, shuffle: bool, seed: int):
        graphs = dm.split(split)
        idx = np.arange(len(graphs))
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        for i in range(0, len(idx), dm.batch_size):
            chunk = [graphs[int(j)] for j in idx[i:i + dm.batch_size]]
            yield shard_stacked_batch(
                pack_for_devices(chunk, D, budget, slot_nodes=slot,
                                 with_spmm_plan=dm.with_spmm_plan),
                mesh, axis)

    eval_batches = {split: list(batches(split, False, 0))
                    for split in ("val", "test")}

    steps_per_epoch = -(-len(dm.split("train")) // dm.batch_size)
    tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                         optim_cfg.weight_decay,
                         optim_cfg.batch_accumulation,
                         optim_cfg.clip_grad_norm,
                         schedule=getattr(optim_cfg, "schedule", "constant"),
                         warmup_steps=getattr(optim_cfg, "warmup_steps", 0),
                         total_steps=training_cfg.epochs * steps_per_epoch)
    metric_fn = METRICS[training_cfg.metric]
    example = jax.tree_util.tree_map(
        lambda x: x[0], eval_batches["val"][0])
    state = init_state(model, tx, example, seed=training_cfg.seed)
    state, start_epoch, best_loss = _maybe_resume(state, checkpointer,
                                                  logger)
    train_step = make_dp_train_step(model, tx, training_cfg.loss_fn, mesh,
                                    node_level=node_level, axis=axis)
    eval_step = make_dp_eval_step(
        model, training_cfg.loss_fn, mesh, node_level=node_level,
        compat_sigmoid_score=compat_sigmoid_score, axis=axis)

    def flatten(x):
        # [D, ...] device axis folded back into the batch axis.
        return np.asarray(x).reshape(-1, *np.asarray(x).shape[2:])

    def _metrics(losses, scores, trues, masks):
        from graph_hscn_tpu.train.loop import _epoch_metrics
        return _epoch_metrics(scores, trues, masks, losses, metric_fn)

    def train_epoch(epoch):
        nonlocal state
        losses, scores, trues, masks = [], [], [], []
        for batch in batches("train", True, training_cfg.seed + epoch):
            state, loss, score, true, mask = train_step(state, batch)
            losses.append(loss)
            scores.append(flatten(score))
            trues.append(flatten(true))
            masks.append(flatten(mask))
        loss, perf = _metrics(losses, scores, trues, masks)
        return loss, perf, None

    def evaluate(split):
        losses, scores, trues, masks = [], [], [], []
        for batch in eval_batches[split]:
            loss, score, true, mask = eval_step(state.params, batch)
            losses.append(loss)
            scores.append(flatten(score))
            trues.append(flatten(true))
            masks.append(flatten(mask))
        return _metrics(losses, scores, trues, masks)

    return run_fit_loop(training_cfg, logger, checkpointer, train_epoch,
                        evaluate, lambda: state, start_epoch=start_epoch,
                        best_loss=best_loss)
