"""GPS-style graph transformer: local MPNN + per-graph global attention.

The reference positions Graph-HSCN against the SAN graph transformer
(reference README.md:27,31) but ships no transformer of its own.  This
module adds the transformer-hybrid family (the GraphGPS recipe: parallel
local message passing and global self-attention per layer) as a
first-class model — and it is the most TPU-friendly model in the zoo:
global attention over the slotted layout is a batched ``[G, S, S]`` masked
softmax-matmul, pure MXU work with zero gather/scatter, and the
flat↔blocked conversion is a free reshape.

Layer (pre-norm):
  h_local  = x + Drop(LocalConv(LN(x)))       GCN over the graph edges
  h_global = x + Drop(MHA(LN(x), node mask))  dense per-graph attention
  h        = h_local + h_global
  out      = h + Drop(FFN(LN(h)))             2-layer GELU MLP

Requires slotted dense packing (``runtime.dense_path: auto|dense`` — the
default), which pads every graph into a fixed node slot so the flat node
array reshapes to ``[G-1, slot, H]``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.models.layers import GCNConv, glorot
from graph_hscn_tpu.ops.dense import resolve_dense_adj
from graph_hscn_tpu.ops.segment import graph_readout_mean

NEG_INF = -1e9


class GraphMHA(nn.Module):
    """Multi-head self-attention over per-graph slot blocks.

    ``xb [G, S, H]``, ``mask [G, S]`` (True = real node).  Padding slots
    are excluded as keys via an additive bias and zeroed as queries on the
    way out.  Softmax runs in f32 for stability regardless of the compute
    dtype.
    """

    hidden: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, xb: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        assert self.hidden % self.num_heads == 0, (
            f"hidden {self.hidden} not divisible by heads {self.num_heads}")
        hd = self.hidden // self.num_heads
        G, S, _ = xb.shape

        def proj(name):
            return nn.DenseGeneral(features=(self.num_heads, hd),
                                   kernel_init=glorot, dtype=self.dtype,
                                   name=name)(xb)           # [G, S, nh, hd]

        q, k, v = proj("query"), proj("key"), proj("value")
        scores = jnp.einsum("gqhd,gkhd->ghqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)).astype(q.dtype)
        bias = jnp.where(mask, 0.0, NEG_INF)[:, None, None, :]
        attn = nn.softmax((scores + bias.astype(scores.dtype))
                          .astype(jnp.float32), axis=-1)
        out = jnp.einsum("ghqk,gkhd->gqhd", attn.astype(v.dtype), v)
        out = nn.DenseGeneral(features=self.hidden, axis=(-2, -1),
                              kernel_init=glorot, dtype=self.dtype,
                              name="out")(out)
        return jnp.where(mask[:, :, None], out, 0.0)


class GPSLayer(nn.Module):
    hidden: int
    num_heads: int
    dropout: float
    local_conv: str = "gcn"      # "gcn" | "gatedgcn" (edge features)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, batch: GraphBatch, dense_adj, train: bool,
                 edge_state=None):
        slot = batch.slot
        n = batch.num_nodes_padded

        def drop(h):
            if self.dropout > 0.0:
                h = nn.Dropout(rate=self.dropout,
                               deterministic=not train)(h)
            return h

        # Local message passing over the real edges.
        h = nn.LayerNorm(dtype=self.dtype)(x)
        e_out = edge_state
        if self.local_conv == "gatedgcn":
            from graph_hscn_tpu.models.layers import GatedGCNConv
            local, e_out = GatedGCNConv(
                features=self.hidden, residual=False, norm="none",
                dtype=self.dtype)(
                h, edge_state, batch.senders, batch.receivers,
                batch.edge_mask, num_nodes=n, train=train,
                plan=batch.spmm)
            h_local = x + drop(local)
        else:
            local = GCNConv(features=self.hidden, dtype=self.dtype)(
                h, batch.senders, batch.receivers, batch.edge_mask,
                num_nodes=n, dense_adj=dense_adj, plan=batch.spmm)
            h_local = x + drop(nn.relu(local))

        # Global: dense per-graph attention on the slot blocks.
        g = nn.LayerNorm(dtype=self.dtype)(x)
        gb = g.reshape(-1, slot, g.shape[-1])
        mb = batch.node_mask.reshape(-1, slot)
        attn = GraphMHA(hidden=self.hidden, num_heads=self.num_heads,
                        dtype=self.dtype)(gb, mb)
        h_global = x + drop(attn.reshape(-1, self.hidden))

        h = h_local + h_global
        f = nn.LayerNorm(dtype=self.dtype)(h)
        f = nn.Dense(2 * self.hidden, dtype=self.dtype)(f)
        f = nn.gelu(f)
        f = nn.Dense(self.hidden, dtype=self.dtype)(f)
        return h + drop(f), e_out


class GPSModel(nn.Module):
    """Input projection -> L GPS layers -> masked mean readout -> head."""

    num_features: int
    hidden_channels: int
    num_classes: int
    num_layers: int
    num_heads: int = 4
    dropout: float = 0.0
    local_conv: str = "gcn"      # "gatedgcn" threads edge features through
    readout: str = "mean"        # "none" for node-level tasks
    dtype: Any = None

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = True):
        if batch.slot is None:
            raise ValueError(
                "GPS global attention needs the slotted dense layout — "
                "keep runtime.dense_path at 'auto'/'dense' (a graph may "
                "exceed DENSE_PATH_MAX_NODES)")
        x = nn.Dense(self.hidden_channels, kernel_init=glorot,
                     dtype=self.dtype)(batch.node_feat)
        e = None
        if self.local_conv == "gatedgcn":
            ef = (batch.edge_feat if batch.edge_feat is not None
                  else jnp.ones((batch.num_edges_padded, 1), jnp.float32))
            e = nn.Dense(self.hidden_channels, kernel_init=glorot,
                         dtype=self.dtype)(ef)
        dense_adj = resolve_dense_adj(batch)
        for _ in range(self.num_layers):
            x, e = GPSLayer(hidden=self.hidden_channels,
                            num_heads=self.num_heads, dropout=self.dropout,
                            local_conv=self.local_conv,
                            dtype=self.dtype)(x, batch, dense_adj, train,
                                              edge_state=e)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(self.num_classes, kernel_init=glorot,
                     dtype=self.dtype)(x)
        x = jnp.where(batch.node_mask[:, None], x, 0.0).astype(jnp.float32)
        if self.readout == "none":
            return x
        return graph_readout_mean(x, batch.node_graph,
                                  batch.num_graphs_padded)
