"""MPNN baselines (GCN/GAT/GIN stacks) — TPU-native version of the
reference's MPNN (reference mpnn.py:13-76).

Structure per the reference:
  layer 0:   conv(F -> H)
  layers 1..L-2: conv(H -> H)
  layer L-1: conv(H -> C)
  readout:   segment-mean over the batch vector (mpnn.py:60)

Reference quirks, encoded behind ``compat`` (SURVEY §2.2):
  #1 double activation: F.relu is hard-coded before the configured
     activation (mpnn.py:52,57).  compat=True reproduces relu∘act;
     compat=False applies only the configured activation.
  #2 norm-flag bug: BN layers exist only when use_layer_norm is set
     (mpnn.py:35-38).  We implement both norms correctly; compat mode keeps
     the reference's *effective* behavior (BN crashes never happen because
     parity configs never enable it).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.models.layers import (ACTIVATIONS, GATConv, GCNConv,
                                          GINConv)
from graph_hscn_tpu.ops.segment import graph_readout_mean

CONV_TYPES = {"gcn": GCNConv, "gat": GATConv, "gin": GINConv}


class MPNN(nn.Module):
    conv_type: str
    activation: str
    num_features: int
    hidden_channels: int
    num_classes: int
    num_layers: int
    dropout: float = 0.0
    use_batch_norm: bool = False
    use_layer_norm: bool = False
    compat_double_relu: bool = True
    readout: str = "mean"        # graph-level; "none" for node-level tasks
    dtype: Any = None            # bf16 compute (params/logits stay f32)
    num_heads: int = 1           # GAT only: H heads of hidden//H, concat

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = True):
        conv_cls = CONV_TYPES[self.conv_type.lower()]
        act: Callable = ACTIVATIONS[self.activation.lower()]
        x = batch.node_feat
        n = batch.num_nodes_padded

        dims = ([self.hidden_channels] * (self.num_layers - 1)
                + [self.num_classes])
        from graph_hscn_tpu.ops.dense import resolve_dense_adj
        ct = self.conv_type.lower()
        extra = {}
        if ct in ("gcn", "gin"):
            # Dense slotted path / Pallas plan flow through where supported.
            extra = {"dense_adj": resolve_dense_adj(batch),
                     "plan": batch.spmm}
        elif ct == "gat":
            extra = {"dense_adj": resolve_dense_adj(batch),
                     "plan": batch.spmm}
        if ct == "gcn" and extra.get("dense_adj") is not None:
            # Normalize the adjacency ONCE for the whole stack: it is
            # layer-independent, and per-layer re-normalization
            # materializes a fresh [G, S, S] array each layer.
            adj_n, diag_n = GCNConv.normalize_dense(extra["dense_adj"])
            extra = {"dense_adj": adj_n, "dense_diag": diag_n,
                     "dense_pre_normalized": True, "plan": batch.spmm}
        for i, dim in enumerate(dims):
            if ct == "gat" and self.num_heads > 1:
                # Multi-head GAT, PyG convention: hidden layers split the
                # width across H concatenated heads; the output layer
                # averages heads (concat=False) to hit num_classes.
                last = i == self.num_layers - 1
                conv = GATConv(
                    features=dim if last else dim // self.num_heads,
                    heads=self.num_heads, concat=not last,
                    dtype=self.dtype)
            else:
                conv = conv_cls(features=dim, dtype=self.dtype)
            x = conv(x, batch.senders, batch.receivers, batch.edge_mask,
                     num_nodes=n, **extra)
            if i < self.num_layers - 1:
                if self.compat_double_relu:
                    x = nn.relu(x)
                if self.use_batch_norm:
                    x = nn.BatchNorm(use_running_average=not train,
                                     dtype=self.dtype)(x)
                if self.use_layer_norm:
                    x = nn.LayerNorm(dtype=self.dtype)(x)
                x = act(x)
                if self.dropout > 0.0:
                    x = nn.Dropout(rate=self.dropout,
                                   deterministic=not train)(x)
        # Mask padding before readout so dummy rows can't leak; logits back
        # to f32 so losses/metrics are full-precision.
        x = jnp.where(batch.node_mask[:, None], x, 0.0).astype(jnp.float32)
        if self.readout == "none":
            return x
        return graph_readout_mean(x, batch.node_graph,
                                  batch.num_graphs_padded)


def build_mpnn(model_cfg, num_features: int, num_classes: int,
               compat: bool = True, readout: str = "mean", dtype=None):
    """Mirror of reference build_mpnn (mpnn.py:63-76), extended with the
    GatedGCN family (not constructible in the reference) and an optional
    bf16 compute dtype (runtime.compute_dtype)."""
    if model_cfg.conv_type.lower() == "gatedgcn":
        from graph_hscn_tpu.models.gatedgcn import GatedGCNNet
        return GatedGCNNet(
            hidden_channels=model_cfg.hidden_channels,
            num_classes=num_classes,
            num_layers=model_cfg.num_layers,
            dropout=model_cfg.dropout,
            readout=readout,
            dtype=dtype,
        )
    if model_cfg.conv_type.lower() == "gps":
        from graph_hscn_tpu.models.gps import GPSModel
        return GPSModel(
            num_features=num_features,
            hidden_channels=model_cfg.hidden_channels,
            num_classes=num_classes,
            num_layers=model_cfg.num_layers,
            num_heads=model_cfg.num_heads,
            dropout=model_cfg.dropout,
            local_conv=getattr(model_cfg, "gps_local_conv", "gcn").lower(),
            readout=readout,
            dtype=dtype,
        )
    return MPNN(
        conv_type=model_cfg.conv_type,
        activation=model_cfg.activation,
        num_features=num_features,
        hidden_channels=model_cfg.hidden_channels,
        num_classes=num_classes,
        num_layers=model_cfg.num_layers,
        dropout=model_cfg.dropout,
        use_batch_norm=model_cfg.use_batch_norm,
        use_layer_norm=model_cfg.use_layer_norm,
        compat_double_relu=compat,
        readout=readout,
        dtype=dtype,
        num_heads=getattr(model_cfg, "num_heads", 1),
    )
