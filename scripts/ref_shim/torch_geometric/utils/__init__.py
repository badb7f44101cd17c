"""torch_geometric.utils symbols the reference imports
(hscn.py:14, posenc.py:5-9)."""

from __future__ import annotations

import torch


def to_dense_adj(edge_index: torch.Tensor, batch=None, edge_attr=None,
                 max_num_nodes: int | None = None) -> torch.Tensor:
    """Dense [1, N, N] adjacency from an edge index (hscn.py:61 — called
    without batch/edge_attr, so weights are all-ones: SURVEY quirk #7)."""
    if batch is not None:
        raise NotImplementedError(
            "to_dense_adj shim supports the reference's single-graph call "
            "(hscn.py:61) only")
    n = max_num_nodes
    if n is None:
        n = int(edge_index.max().item()) + 1 if edge_index.numel() else 0
    adj = torch.zeros(1, n, n)
    vals = (edge_attr if edge_attr is not None
            else torch.ones(edge_index.size(1)))
    adj[0].index_put_((edge_index[0], edge_index[1]), vals, accumulate=True)
    return adj


def to_undirected(edge_index: torch.Tensor) -> torch.Tensor:
    """Symmetrize + dedupe (posenc.py:30)."""
    n = int(edge_index.max().item()) + 1 if edge_index.numel() else 0
    both = torch.cat([edge_index, edge_index.flip(0)], dim=1)
    key = torch.unique(both[0] * max(n, 1) + both[1], sorted=True)
    row = torch.div(key, max(n, 1), rounding_mode="floor")
    col = key % max(n, 1)
    return torch.stack([row, col])


def get_laplacian(edge_index: torch.Tensor, edge_weight=None,
                  normalization: str | None = None,
                  num_nodes: int | None = None):
    """Graph Laplacian in COO parts (posenc.py:37-39): L = D - A, or the
    symmetric normalization I - D^-1/2 A D^-1/2 when
    normalization='sym'."""
    n = num_nodes
    if n is None:
        n = int(edge_index.max().item()) + 1 if edge_index.numel() else 0
    if edge_weight is None:
        edge_weight = torch.ones(edge_index.size(1))
    row, col = edge_index[0], edge_index[1]
    deg = torch.zeros(n).index_add_(0, col, edge_weight)
    loops = torch.arange(n)
    if normalization == "sym":
        dis = deg.pow(-0.5)
        dis.masked_fill_(dis == float("inf"), 0.0)
        off_w = -dis[row] * edge_weight * dis[col]
        loop_w = torch.ones(n)
    elif normalization == "rw":
        di = deg.pow(-1.0)
        di.masked_fill_(di == float("inf"), 0.0)
        off_w = -di[row] * edge_weight
        loop_w = torch.ones(n)
    else:
        off_w = -edge_weight
        loop_w = deg
    ei = torch.cat([edge_index, torch.stack([loops, loops])], dim=1)
    ew = torch.cat([off_w, loop_w])
    return ei, ew


def to_scipy_sparse_matrix(edge_index: torch.Tensor, edge_attr=None,
                           num_nodes: int | None = None):
    """COO scipy matrix (posenc.py:37)."""
    import scipy.sparse as sp
    n = num_nodes
    if n is None:
        n = int(edge_index.max().item()) + 1 if edge_index.numel() else 0
    w = (edge_attr if edge_attr is not None
         else torch.ones(edge_index.size(1)))
    return sp.coo_matrix(
        (w.numpy(), (edge_index[0].numpy(), edge_index[1].numpy())),
        shape=(n, n))
