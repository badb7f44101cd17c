"""Pure-torch torch_scatter stand-in for the reference subprocess.

The reference uses two symbols: ``scatter_mean`` for the MPNN graph readout
(/root/reference/graph_hscn/model/mpnn.py:8,60) and ``scatter`` in SignNet
(/root/reference/graph_hscn/encoder/signnet.py:6,255).  Semantics follow the
torch_scatter 2.x API for the call patterns the reference uses
(dim=0 segment reductions over a batch vector).
"""

from __future__ import annotations

import torch


def _dim_size(index: torch.Tensor, dim_size: int | None) -> int:
    if dim_size is not None:
        return dim_size
    return int(index.max().item()) + 1 if index.numel() else 0


def scatter_sum(src: torch.Tensor, index: torch.Tensor, dim: int = 0,
                dim_size: int | None = None) -> torch.Tensor:
    n = _dim_size(index, dim_size)
    shape = list(src.shape)
    shape[dim] = n
    out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    return out.index_add_(dim, index, src)


def scatter_mean(src: torch.Tensor, index: torch.Tensor, dim: int = 0,
                 dim_size: int | None = None) -> torch.Tensor:
    total = scatter_sum(src, index, dim, dim_size)
    ones = torch.ones(index.shape[0], dtype=src.dtype, device=src.device)
    count = scatter_sum(ones, index, 0, total.shape[dim]).clamp(min=1)
    view = [1] * total.ndim
    view[dim] = -1
    return total / count.view(view)


def scatter_max(src: torch.Tensor, index: torch.Tensor, dim: int = 0,
                dim_size: int | None = None):
    n = _dim_size(index, dim_size)
    shape = list(src.shape)
    shape[dim] = n
    out = torch.full(shape, float("-inf"), dtype=src.dtype,
                     device=src.device)
    idx = index
    if src.ndim > 1 and dim == 0:
        idx = index.view(-1, *([1] * (src.ndim - 1))).expand_as(src)
    out = out.scatter_reduce(dim, idx, src, reduce="amax",
                             include_self=True)
    out = torch.where(torch.isinf(out), torch.zeros_like(out), out)
    return out, None  # torch_scatter also returns argmax; unused here.


def scatter(src: torch.Tensor, index: torch.Tensor, dim: int = 0,
            dim_size: int | None = None, reduce: str = "sum"):
    if reduce in ("sum", "add"):
        return scatter_sum(src, index, dim, dim_size)
    if reduce == "mean":
        return scatter_mean(src, index, dim, dim_size)
    if reduce == "max":
        return scatter_max(src, index, dim, dim_size)[0]
    raise ValueError(f"unsupported reduce: {reduce}")
