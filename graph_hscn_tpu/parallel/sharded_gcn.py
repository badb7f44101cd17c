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
from jax.sharding import Mesh, PartitionSpec as P

from graph_hscn_tpu.ops.segment import segment_sum
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange


def _halo(x_blk, send_idx, axis):
    """Exchange: returns the [D*H, F] halo table for this device."""
    outbound = jnp.take(x_blk, send_idx, axis=0)        # [D, H, F]
    inbound = jax.lax.all_to_all(outbound, axis, split_axis=0,
                                 concat_axis=0, tiled=False)
    return inbound.reshape(-1, x_blk.shape[-1])


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


def make_sharded_gcn(mesh: Mesh, num_layers: int, axis: str = "data"):
    """Builds (forward_fn, train_step_fn) over the mesh.

    forward(params, x_blocks, plan_arrays) -> logits blocks [D, Nb, C]
    train_step(params, opt_state, tx, batch arrays) handled by caller via
    the returned grad_fn.
    All per-device arrays carry the leading device axis sharded over
    ``axis``; params are replicated.
    """

    def per_device_forward(params, x_blk, send_idx, snd_loc, rcv_loc,
                           m_loc, snd_hal, rcv_hal, m_hal):
        x = x_blk[0]
        send_idx = send_idx[0]
        snd_loc, rcv_loc, m_loc = snd_loc[0], rcv_loc[0], m_loc[0]
        snd_hal, rcv_hal, m_hal = snd_hal[0], rcv_hal[0], m_hal[0]
        nb = x.shape[0]

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

        h = x
        for layer in params:
            h = h @ layer["kernel"]
            # Issue the exchange first; aggregate local edges while the
            # all_to_all is in flight; consume the halo last.
            halo = _halo(h, send_idx, axis)
            agg = segment_sum(h[snd_loc] * w_loc[:, None], rcv_loc, nb)
            agg = agg + segment_sum(halo[snd_hal] * w_hal[:, None],
                                    rcv_hal, nb)
            h = agg + diag[:, None] * h + layer["bias"]
            if layer is not params[-1]:
                h = jax.nn.relu(h)
        return h[None]

    forward = jax.jit(jax.shard_map(
        per_device_forward, mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 8,
        out_specs=P(axis),
        check_vma=False,
    ))

    def per_device_value_grad(params, x_blk, send_idx, snd_loc, rcv_loc,
                              m_loc, snd_hal, rcv_hal, m_hal, y_blk,
                              node_ok_blk, gcnt):
        def local_loss(params):
            logits = per_device_forward(
                params, x_blk, send_idx, snd_loc, rcv_loc, m_loc,
                snd_hal, rcv_hal, m_hal)[0]
            y = y_blk[0]
            ok = node_ok_blk[0].astype(logits.dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
            return jnp.sum(per * ok) / gcnt

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis),
                                       grads)
        return loss, grads

    _PLAN_KEYS = ("send_idx", "snd_loc", "rcv_loc", "mask_loc",
                  "snd_hal", "rcv_hal", "mask_hal")

    def value_and_grad(params, x_blocks, plan, y_blocks, node_ok_blocks):
        gcnt = float(np.maximum(np.asarray(node_ok_blocks).sum(), 1.0))
        return _vg(params, x_blocks, *(plan[k] for k in _PLAN_KEYS),
                   y_blocks, node_ok_blocks, gcnt)

    _vg = jax.jit(jax.shard_map(
        per_device_value_grad, mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 10 + (None,),
        out_specs=(P(), P()),
        check_vma=False,
    ), static_argnums=(11,))

    def forward_wrapper(params, x_blocks, plan):
        return forward(params, x_blocks, *(plan[k] for k in _PLAN_KEYS))

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
