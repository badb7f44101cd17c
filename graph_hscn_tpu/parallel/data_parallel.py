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
                     budget: PadBudget) -> GraphBatch:
    """Round-robin graphs across devices, pack one sub-batch per device with
    the *same* per-device budget, stack along a leading device axis."""
    shards: list[list[GraphData]] = [[] for _ in range(num_devices)]
    order = np.argsort([-g.num_nodes for g in graphs])  # big-first balance
    loads = np.zeros(num_devices)
    for i in order:
        d = int(np.argmin(loads))
        shards[d].append(graphs[int(i)])
        loads[d] += graphs[int(i)].num_nodes
    batches = [pack_batch(s, budget) if s else _empty_batch(graphs[0], budget)
               for s in shards]
    return stack_device_batches(batches)


def _empty_batch(proto: GraphData, budget: PadBudget) -> GraphBatch:
    tiny = GraphData(
        x=np.zeros((1, proto.x.shape[1]), np.float32),
        edge_index=np.zeros((2, 0), np.int64),
        y=None if proto.y is None else np.zeros_like(np.asarray(proto.y)),
        edge_attr=(None if proto.edge_attr is None
                   else np.zeros((0, proto.edge_attr.shape[1]), np.float32)),
        node_y=(None if proto.node_y is None
                else np.zeros((1, proto.node_y.shape[1]), np.float32)),
        cluster=(None if proto.cluster is None
                 else np.zeros((1,), np.int32)),
    )
    b = pack_batch([tiny], budget)
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
        if loss_fn == "cross_entropy":
            per = (jnp.maximum(pred, 0) - pred * true
                   + jnp.log1p(jnp.exp(-jnp.abs(pred))))
            score = jax.nn.sigmoid(pred)
        elif loss_fn in ("l1", "mae"):
            per = jnp.abs(pred - true)
            score = pred
        else:
            raise ValueError(loss_fn)
        m = mask[:, None].astype(pred.dtype)
        local_sum = jnp.sum(per * m)
        return local_sum / gcnt, (score, true, mask)

    def count_elems(batch: GraphBatch):
        mask = batch.node_mask if node_level else batch.graph_mask
        width = (batch.node_y if node_level else batch.y).shape[-1]
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
