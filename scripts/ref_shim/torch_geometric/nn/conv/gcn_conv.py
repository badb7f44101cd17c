"""GCNConv + gcn_norm, faithful to PyG 2.x public semantics.

Call sites in the reference: CONV_DICT["gcn"] (config.py:19-23) used by the
MPNN stack (mpnn.py:29-32,52,59) and the HSCN ll/vv relations
(hscn.py:117-125, lazy in_channels=-1, add_self_loops=False); standalone
``gcn_norm`` in the clustering trainer (train_clustering.py:6,37-42).

Semantics mirrored from PyG's torch_geometric/nn/conv/gcn_conv.py:
self-loops with fill value 1 (2 if improved), symmetric normalization
D^-1/2 (A+I) D^-1/2 with degree accumulated over target columns, messages
flowing source->target, bias added after aggregation.
"""

from __future__ import annotations

import torch
from torch import nn

from ..linear import Linear


def gcn_norm(edge_index, edge_weight=None, num_nodes=None, improved=False,
             add_self_loops=True, flow="source_to_target", dtype=None):
    fill_value = 2.0 if improved else 1.0
    device = edge_index.device
    if num_nodes is None:
        num_nodes = int(edge_index.max().item()) + 1 if edge_index.numel() \
            else 0
    if edge_weight is None:
        edge_weight = torch.ones(edge_index.size(1), dtype=dtype or
                                 torch.float32, device=device)
    if add_self_loops:
        loops = torch.arange(num_nodes, device=device)
        edge_index = torch.cat(
            [edge_index, torch.stack([loops, loops])], dim=1)
        edge_weight = torch.cat(
            [edge_weight,
             torch.full((num_nodes,), fill_value,
                        dtype=edge_weight.dtype, device=device)])
    row, col = edge_index[0], edge_index[1]
    deg = torch.zeros(num_nodes, dtype=edge_weight.dtype, device=device)
    deg.index_add_(0, col, edge_weight)
    deg_inv_sqrt = deg.pow(-0.5)
    deg_inv_sqrt.masked_fill_(deg_inv_sqrt == float("inf"), 0.0)
    return edge_index, deg_inv_sqrt[row] * edge_weight * deg_inv_sqrt[col]


class MessagePassing(nn.Module):
    """Base marker class (the reference uses it only for typing:
    config.py:19, mpnn.py:7,16, hscn.py:13,117).  Accepts and ignores the
    MessagePassing kwargs PyG tolerates."""

    def __init__(self, aggr="add", flow="source_to_target", node_dim=-2,
                 **kwargs):
        super().__init__()
        self.aggr = aggr
        self.flow = flow


class GCNConv(MessagePassing):
    def __init__(self, in_channels: int, out_channels: int,
                 improved: bool = False, cached: bool = False,
                 add_self_loops: bool = True, normalize: bool = True,
                 bias: bool = True, **kwargs):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.improved = improved
        self.add_self_loops = add_self_loops
        self.normalize = normalize
        self.lin = Linear(in_channels, out_channels, bias=False,
                          weight_initializer="glorot")
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)

    def forward(self, x, edge_index, edge_weight=None):
        if isinstance(x, (tuple, list)):
            raise ValueError(
                "GCNConv does not support bipartite (tuple) inputs — the "
                "reference documents this: hscn.py:117-121 / config.py:80 "
                "('Must be GAT first or will error out').")
        num_nodes = x.size(0)
        if self.normalize:
            edge_index, edge_weight = gcn_norm(
                edge_index, edge_weight, num_nodes, self.improved,
                self.add_self_loops, dtype=x.dtype)
        x = self.lin(x)
        row, col = edge_index[0], edge_index[1]
        msg = x[row]
        if edge_weight is not None:
            msg = msg * edge_weight.view(-1, 1)
        out = torch.zeros(num_nodes, x.size(1), dtype=x.dtype,
                          device=x.device)
        out.index_add_(0, col, msg)
        if self.bias is not None:
            out = out + self.bias
        return out
