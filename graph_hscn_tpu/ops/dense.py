"""Device-side dense-block view of a GraphBatch.

For molecular-scale graphs the fastest TPU message-passing is a batched dense
matmul on the MXU: re-block the flat node array into ``[G, n_max, F]`` and the
edge list into ``[G, n_max, n_max]`` adjacencies, then every conv layer is
``adj @ x`` (plus masking).  This module performs that conversion inside jit
with static shapes.

Also hosts the dense MinCUT pooling math (replacing PyG ``dense_mincut_pool``,
reference hscn.py:63) — see :func:`mincut_pool`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from graph_hscn_tpu.data.structures import GraphBatch


def build_dense_adj(batch: GraphBatch, weighted: bool = True):
    """Device-side dense per-graph adjacency for the slotted layout:
    [G-1, slot, slot] with adj[g, dst_local, src_local].

    One scatter-add over the edge list (~E elements) — built on device
    because shipping the materialized [G, slot^2] array from host costs
    ~100x the edge list in transfer bytes.
    """
    slot = batch.slot
    assert slot is not None, "build_dense_adj requires slotted packing"
    G = batch.num_graphs_padded - 1
    g_e = batch.receivers // slot            # slot id == graph id (slotted)
    lr = batch.receivers - g_e * slot
    ls = batch.senders - g_e * slot
    w = (batch.edge_weight if (weighted and batch.edge_weight is not None)
         else jnp.ones_like(batch.senders, jnp.float32))
    w = jnp.where(batch.edge_mask, w, 0.0)
    # Same-slot guard: padding edges self-loop on node N-1, still inside the
    # last slot; masked weight 0 makes them harmless, but cross-slot edges
    # (never produced by the packer) would corrupt rows — clamp for safety.
    flat = g_e * (slot * slot) + lr * slot + ls
    flat = jnp.where(batch.edge_mask, flat, G * slot * slot)
    adj = jnp.zeros((G * slot * slot + 1,), jnp.float32)
    adj = adj.at[flat].add(w)
    return adj[:-1].reshape(G, slot, slot)


def resolve_dense_adj(batch: GraphBatch, weighted: bool = True):
    """dense_adj if materialized, else build on device (slotted), else
    None."""
    if batch.dense_adj is not None:
        return batch.dense_adj
    if batch.slot is not None:
        return build_dense_adj(batch, weighted=weighted)
    return None


@functools.partial(jax.jit, static_argnames=("max_nodes",))
def batch_to_dense(batch: GraphBatch, max_nodes: int):
    """GraphBatch -> (x [G, n_max, F], adj [G, n_max, n_max], mask [G, n_max]).

    G excludes the trailing dummy padding graph.  Nodes of graph g occupy the
    first n_node[g] rows of block g.  Weighted if batch.edge_weight is set.
    """
    G = batch.num_graphs_padded - 1
    N = batch.num_nodes_padded
    F = batch.node_feat.shape[-1]

    # Position of each node within its graph: global index minus graph offset.
    node_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(batch.n_node)[:-1]])
    local_idx = (jnp.arange(N, dtype=jnp.int32)
                 - node_offsets[batch.node_graph])
    # Scatter node features into [G, n_max, F].
    flat_idx = batch.node_graph * max_nodes + local_idx
    flat_idx = jnp.where(batch.node_mask, flat_idx, G * max_nodes)
    x = jnp.zeros((G * max_nodes + 1, F), batch.node_feat.dtype)
    x = x.at[flat_idx].set(jnp.where(batch.node_mask[:, None],
                                     batch.node_feat, 0.0))
    x = x[:-1].reshape(G, max_nodes, F)

    mask = jnp.zeros((G * max_nodes + 1,), bool)
    mask = mask.at[flat_idx].set(batch.node_mask)
    mask = mask[:-1].reshape(G, max_nodes)

    # Adjacency: scatter 1 (or edge_weight) at [g, local_recv, local_send].
    eg = batch.node_graph[batch.receivers]
    ls = local_idx[batch.senders]
    lr = local_idx[batch.receivers]
    w = (batch.edge_weight if batch.edge_weight is not None
         else jnp.ones_like(ls, dtype=x.dtype))
    w = jnp.where(batch.edge_mask, w, 0.0)
    adj_idx = eg * (max_nodes * max_nodes) + lr * max_nodes + ls
    adj_idx = jnp.where(batch.edge_mask, adj_idx, G * max_nodes * max_nodes)
    adj = jnp.zeros((G * max_nodes * max_nodes + 1,), x.dtype)
    adj = adj.at[adj_idx].add(w)
    adj = adj[:-1].reshape(G, max_nodes, max_nodes)
    return x, adj, mask


@functools.partial(jax.jit, static_argnames=())
def dense_to_nodes(x_dense: jnp.ndarray, batch: GraphBatch) -> jnp.ndarray:
    """[G, n_max, F] -> flat [N, F] aligned with batch.node_feat rows."""
    G, n_max, F = x_dense.shape
    N = batch.num_nodes_padded
    node_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(batch.n_node)[:-1]])
    local_idx = (jnp.arange(N, dtype=jnp.int32)
                 - node_offsets[batch.node_graph])
    flat = x_dense.reshape(G * n_max, F)
    idx = batch.node_graph * n_max + local_idx
    idx = jnp.clip(idx, 0, G * n_max - 1)
    out = flat[idx]
    return jnp.where(batch.node_mask[:, None], out, 0.0)


def mincut_pool(x, adj, s_logits, mask=None):
    """Relaxed MinCUT pooling losses (Bianchi et al. 2020), matching PyG's
    ``dense_mincut_pool`` semantics (reference hscn.py:63) but batched.

    Args:
      x:        [G, n, F] node features.
      adj:      [G, n, n] dense adjacency.
      s_logits: [G, n, K] cluster assignment logits.
      mask:     [G, n] bool or None.

    Returns (x_pool [G,K,F], adj_pool [G,K,K], mincut_loss [], ortho_loss [])
    where the losses are means over the batch.
    """
    s = jax.nn.softmax(s_logits, axis=-1)
    if mask is not None:
        m = mask[..., None].astype(x.dtype)
        x = x * m
        s = s * m

    x_pool = jnp.einsum("gnk,gnf->gkf", s, x)
    # S^T A S : [G, K, K]
    as_ = jnp.einsum("gnm,gmk->gnk", adj, s)
    adj_pool = jnp.einsum("gnk,gnl->gkl", s, as_)

    # MinCut numerator: tr(S^T A S); denominator: tr(S^T D S).
    num = jnp.einsum("gkk->g", adj_pool)
    deg = jnp.sum(adj, axis=-1)  # [G, n] out-degree (row-sum)
    d_s = s * deg[..., None]
    den = jnp.einsum("gnk,gnk->g", d_s, s)
    mincut_loss = -(num / jnp.maximum(den, 1e-12))
    mincut_loss = jnp.mean(mincut_loss)

    # Orthogonality: || SS^T/||SS^T||_F - I/sqrt(K) ||_F
    ss = jnp.einsum("gnk,gnl->gkl", s, s)
    k = s.shape[-1]
    ss_norm = jnp.linalg.norm(ss, axis=(-1, -2), keepdims=True)
    ident = jnp.eye(k, dtype=x.dtype) / jnp.sqrt(jnp.asarray(k, x.dtype))
    ortho = jnp.linalg.norm(ss / jnp.maximum(ss_norm, 1e-12) - ident,
                            axis=(-1, -2))
    ortho_loss = jnp.mean(ortho)

    # Zero the pooled diagonal + renormalize adj_pool, as PyG does.
    eye = jnp.eye(k, dtype=bool)
    adj_pool = jnp.where(eye, 0.0, adj_pool)
    d = jnp.sqrt(jnp.sum(adj_pool, axis=-1) + 1e-15)
    adj_pool = adj_pool / d[..., None] / d[..., None, :]

    return x_pool, adj_pool, mincut_loss, ortho_loss
