"""Symbols the reference imports from torch_geometric.nn
(mpnn.py:7, hscn.py:6-13, signnet.py:5, config.py:8-9)."""

from __future__ import annotations

import torch
from torch import nn

from .conv import (  # noqa: F401
    GATConv,
    GCNConv,
    GINConv,
    GraphConv,
    HeteroConv,
    MessagePassing,
)
from .linear import Linear  # noqa: F401


class Sequential(nn.Module):
    """Minimal PyG Sequential: a signature string plus a list of either
    modules (applied to the running first argument) or (module, "in -> out")
    tuples.  Exactly the subset SCN uses (hscn.py:30-45:
    "x, edge_index, edge_weight" with per-conv "x, edge_index,
    edge_weight -> x" routing)."""

    def __init__(self, signature: str, modules: list):
        super().__init__()
        self.input_args = [a.strip() for a in signature.split(",")]
        self.entries = []  # (routing or None, module) in declared order.
        self._mods = nn.ModuleList()
        for item in modules:
            if isinstance(item, tuple):
                module, desc = item
                ins, out = desc.split("->")
                routing = ([a.strip() for a in ins.split(",")], out.strip())
            else:
                module, routing = item, None
            if isinstance(module, nn.Module):
                self._mods.append(module)
            self.entries.append((routing, module))

    def forward(self, *args):
        scope = dict(zip(self.input_args, args))
        current = args[0]
        for routing, module in self.entries:
            if routing is None:
                current = module(current)
                scope[self.input_args[0]] = current
            else:
                ins, out = routing
                current = module(*[scope[a] for a in ins])
                scope[out] = current
        return current


def global_mean_pool(x: torch.Tensor, batch: torch.Tensor,
                     size: int | None = None) -> torch.Tensor:
    """Per-graph mean over the batch vector (hscn.py:111)."""
    from torch_scatter import scatter_mean
    return scatter_mean(x, batch, dim=0, dim_size=size)


EPS = 1e-15


def dense_mincut_pool(x: torch.Tensor, adj: torch.Tensor, s: torch.Tensor,
                      mask=None):
    """PyG dense_mincut_pool (hscn.py:63): relaxed MinCUT pooling.

    Returns (pooled_x, pooled_adj, mincut_loss, ortho_loss) with the PyG
    formulation: mincut = -Tr(S^T A S)/Tr(S^T D S) averaged over batch;
    ortho = ||SS/||SS||_F - I/sqrt(K)||_F averaged over batch; the pooled
    adjacency has its diagonal zeroed and is degree-normalized.
    """
    x = x.unsqueeze(0) if x.dim() == 2 else x
    adj = adj.unsqueeze(0) if adj.dim() == 2 else adj
    s = s.unsqueeze(0) if s.dim() == 2 else s
    (batch_size, num_nodes, _), k = x.size(), s.size(-1)
    s = torch.softmax(s, dim=-1)
    if mask is not None:
        mask = mask.view(batch_size, num_nodes, 1).to(x.dtype)
        x, s = x * mask, s * mask

    out = torch.matmul(s.transpose(1, 2), x)
    out_adj = torch.matmul(torch.matmul(s.transpose(1, 2), adj), s)

    # MinCut regularization.
    mincut_num = torch.einsum("bii->b", out_adj)
    d_flat = adj.sum(-1)
    d = torch.diag_embed(d_flat)
    mincut_den = torch.einsum(
        "bii->b", torch.matmul(torch.matmul(s.transpose(1, 2), d), s))
    mincut_loss = -(mincut_num / (mincut_den + EPS))
    mincut_loss = torch.mean(mincut_loss)

    # Orthogonality regularization.
    ss = torch.matmul(s.transpose(1, 2), s)
    i_s = torch.eye(k, device=ss.device, dtype=ss.dtype)
    ortho_loss = torch.norm(
        ss / torch.norm(ss, dim=(-1, -2), keepdim=True)
        - i_s / torch.norm(i_s), dim=(-1, -2))
    ortho_loss = torch.mean(ortho_loss)

    # Fix and normalize the pooled adjacency.
    ind = torch.arange(k, device=out_adj.device)
    out_adj[:, ind, ind] = 0
    deg = torch.einsum("bij->bi", out_adj)
    deg = torch.sqrt(deg + EPS)[:, None]
    out_adj = (out_adj / deg) / deg.transpose(1, 2)

    return out, out_adj, mincut_loss, ortho_loss
