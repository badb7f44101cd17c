"""GatedGCN model for edge-featured graph tasks (BASELINE.json config 2:
Peptides-struct regression).

Not present in the reference (its CONV_DICT has only GCN/GAT/GIN,
config.py:19-23); this is the LRGB-standard baseline architecture:
  node/edge encoders -> L x GatedGCNConv (residual, norm) ->
  mean readout -> MLP head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.models.layers import GatedGCNConv, glorot
from graph_hscn_tpu.ops.segment import graph_readout_mean


class GatedGCNNet(nn.Module):
    hidden_channels: int
    num_classes: int
    num_layers: int
    dropout: float = 0.0
    readout: str = "mean"
    dtype: Any = None   # bf16 compute (params/logits stay f32)

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = True):
        x = nn.Dense(self.hidden_channels, kernel_init=glorot,
                     dtype=self.dtype)(batch.node_feat)
        if batch.edge_feat is not None:
            e = nn.Dense(self.hidden_channels, kernel_init=glorot,
                         dtype=self.dtype)(batch.edge_feat)
        else:
            e = jnp.zeros((batch.num_edges_padded, self.hidden_channels),
                          x.dtype)
        for _ in range(self.num_layers):
            x, e = GatedGCNConv(features=self.hidden_channels,
                                dtype=self.dtype)(
                x, e, batch.senders, batch.receivers, batch.edge_mask,
                num_nodes=batch.num_nodes_padded, train=train,
                plan=batch.spmm)
            if self.dropout > 0:
                x = nn.Dropout(rate=self.dropout,
                               deterministic=not train)(x)
        x = jnp.where(batch.node_mask[:, None], x, 0.0).astype(jnp.float32)
        if self.readout == "none":
            return nn.Dense(self.num_classes, kernel_init=glorot)(x)
        pooled = graph_readout_mean(x, batch.node_graph,
                                    batch.num_graphs_padded)
        h = nn.relu(nn.Dense(self.hidden_channels, kernel_init=glorot)(
            pooled))
        return nn.Dense(self.num_classes, kernel_init=glorot)(h)
