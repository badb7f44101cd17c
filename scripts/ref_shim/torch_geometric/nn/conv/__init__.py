"""Conv layers the reference's CONV_DICT and HSCN relations use
(config.py:19-23, hscn.py:117-125, signnet.py:5)."""

from __future__ import annotations

import torch
from torch import nn

from ..linear import Linear, glorot_
from .gcn_conv import GCNConv, MessagePassing, gcn_norm  # noqa: F401


def _segment_softmax(alpha: torch.Tensor, index: torch.Tensor,
                     num_nodes: int) -> torch.Tensor:
    """Numerically stable softmax over ragged groups (incoming edges of
    each target node) — PyG's utils.softmax semantics."""
    amax = torch.full((num_nodes,) + alpha.shape[1:], float("-inf"),
                      dtype=alpha.dtype, device=alpha.device)
    idx = index
    if alpha.ndim > 1:
        idx = index.view(-1, *([1] * (alpha.ndim - 1))).expand_as(alpha)
    amax = amax.scatter_reduce(0, idx, alpha, reduce="amax",
                               include_self=True)
    amax = torch.where(torch.isinf(amax), torch.zeros_like(amax), amax)
    out = torch.exp(alpha - amax[index])
    denom = torch.zeros_like(amax).index_add_(0, index, out)
    return out / (denom[index] + 1e-16)


class GATConv(MessagePassing):
    """Faithful to PyG GATConv for the configurations the reference uses:
    MPNN stacks GATConv(F, H) (mpnn.py:29-32, heads=1 default) and the
    HSCN l->v relation uses lazy bipartite GATConv((-1,-1), H,
    add_self_loops=False) (hscn.py:117-121).  Accepts and ignores the
    spurious ``cached`` kwarg hscn.py:123-125 passes."""

    def __init__(self, in_channels, out_channels: int, heads: int = 1,
                 concat: bool = True, negative_slope: float = 0.2,
                 dropout: float = 0.0, add_self_loops: bool = True,
                 bias: bool = True, **kwargs):
        super().__init__()
        self.out_channels = out_channels
        self.heads = heads
        self.concat = concat
        self.negative_slope = negative_slope
        self.dropout = dropout
        self.add_self_loops = add_self_loops
        if isinstance(in_channels, (tuple, list)):
            in_src, in_dst = in_channels
            self.lin_src = Linear(in_src, heads * out_channels, bias=False,
                                  weight_initializer="glorot")
            self.lin_dst = Linear(in_dst, heads * out_channels, bias=False,
                                  weight_initializer="glorot")
        else:
            self.lin_src = Linear(in_channels, heads * out_channels,
                                  bias=False, weight_initializer="glorot")
            self.lin_dst = self.lin_src
        self.att_src = nn.Parameter(torch.empty(1, heads, out_channels))
        self.att_dst = nn.Parameter(torch.empty(1, heads, out_channels))
        glorot_(self.att_src)
        glorot_(self.att_dst)
        if bias:
            self.bias = nn.Parameter(torch.zeros(
                heads * out_channels if concat else out_channels))
        else:
            self.register_parameter("bias", None)

    def forward(self, x, edge_index):
        H, C = self.heads, self.out_channels
        if isinstance(x, (tuple, list)):
            x_src, x_dst = x
        else:
            x_src = x_dst = x
        xs = self.lin_src(x_src).view(-1, H, C)
        xd = self.lin_dst(x_dst).view(-1, H, C)
        n_dst = xd.size(0)
        alpha_src = (xs * self.att_src).sum(-1)  # [N_src, H]
        alpha_dst = (xd * self.att_dst).sum(-1)  # [N_dst, H]
        if self.add_self_loops:
            n = min(xs.size(0), n_dst)
            loops = torch.arange(n, device=edge_index.device)
            edge_index = torch.cat(
                [edge_index, torch.stack([loops, loops])], dim=1)
        row, col = edge_index[0], edge_index[1]
        alpha = torch.nn.functional.leaky_relu(
            alpha_src[row] + alpha_dst[col], self.negative_slope)
        alpha = _segment_softmax(alpha, col, n_dst)  # [E, H]
        if self.dropout > 0 and self.training:
            alpha = torch.nn.functional.dropout(alpha, p=self.dropout)
        msg = xs[row] * alpha.unsqueeze(-1)  # [E, H, C]
        out = torch.zeros(n_dst, H, C, dtype=msg.dtype, device=msg.device)
        out.index_add_(0, col, msg)
        out = out.reshape(n_dst, H * C) if self.concat else out.mean(1)
        if self.bias is not None:
            out = out + self.bias
        return out


class GINConv(MessagePassing):
    """PyG GINConv: nn((1 + eps) * x + sum_{j->i} x_j).  Constructed by
    SignNet (signnet.py:5) — the PE path — and listed in CONV_DICT.

    Aggregates over PyG's default ``node_dim=-2``: SignNet feeds 3-D
    inputs [K, N, C] where the node axis is the SECOND-to-last
    (signnet.py:206-208, 271-274 transpose to k x n x c before the GIN
    stack), so gather/scatter must ride dim -2, not dim 0."""

    def __init__(self, nn_module: nn.Module, eps: float = 0.0,
                 train_eps: bool = False, **kwargs):
        super().__init__()
        self.nn = nn_module
        if train_eps:
            self.eps = nn.Parameter(torch.tensor(float(eps)))
        else:
            self.register_buffer("eps", torch.tensor(float(eps)))

    def forward(self, x, edge_index):
        row, col = edge_index[0], edge_index[1]
        agg = torch.zeros_like(x).index_add_(
            -2, col, x.index_select(-2, row))
        return self.nn((1 + self.eps) * x + agg)


class GraphConv(MessagePassing):
    """PyG GraphConv (aggr='add'): W1 x_i + W2 sum_j e_ji x_j — the SCN
    message-passing stack with edge_weight (hscn.py:30-45)."""

    def __init__(self, in_channels: int, out_channels: int,
                 aggr: str = "add", bias: bool = True, **kwargs):
        super().__init__(aggr=aggr)
        self.lin_rel = Linear(in_channels, out_channels, bias=bias)
        self.lin_root = Linear(in_channels, out_channels, bias=False)

    def forward(self, x, edge_index, edge_weight=None):
        row, col = edge_index[0], edge_index[1]
        msg = x[row]
        if edge_weight is not None:
            msg = msg * edge_weight.view(-1, 1)
        agg = torch.zeros_like(x).index_add_(0, col, msg)
        return self.lin_rel(agg) + self.lin_root(x)


class HeteroConv(nn.Module):
    """Relation-dict conv with sum aggregation over destination types
    (hscn.py:82-97).  Same-type relations get the unary call signature,
    cross-type relations the bipartite tuple — PyG HeteroConv semantics."""

    def __init__(self, convs: dict, aggr: str = "sum"):
        super().__init__()
        self.convs = nn.ModuleDict(
            {"__".join(k): v for k, v in convs.items()})
        self.keys = list(convs.keys())
        self.aggr = aggr

    def forward(self, x_dict, edge_index_dict):
        out_dict = {}
        for key in self.keys:
            src, _, dst = key
            if key not in edge_index_dict:
                continue
            conv = self.convs["__".join(key)]
            edge_index = edge_index_dict[key]
            if src == dst:
                out = conv(x_dict[src], edge_index)
            else:
                out = conv((x_dict[src], x_dict[dst]), edge_index)
            if dst in out_dict:
                out_dict[dst] = out_dict[dst] + out
            else:
                out_dict[dst] = out
        return out_dict
