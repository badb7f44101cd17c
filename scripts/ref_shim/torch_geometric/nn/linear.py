"""PyG-style Linear with lazy in_channels=-1 support.

Used directly by hscn.py:8,51,54,99-100 and internally by every shim conv.
Laziness matters because the reference builds its optimizer BEFORE the
first forward (train.py:155 over build_hscn's lazy relation convs,
hscn.py:117-125): the weight is registered at construction as a 0-column
parameter and resized in place at first forward, preserving object
identity so the pre-built optimizer's parameter references stay valid
(Adam-family state is allocated lazily at the first step, after shapes
are final).
"""

from __future__ import annotations

import math

import torch
from torch import nn


def glorot_(t: torch.Tensor):
    stdv = math.sqrt(6.0 / (t.size(-2) + t.size(-1)))
    with torch.no_grad():
        t.uniform_(-stdv, stdv)


class Linear(nn.Module):
    def __init__(self, in_channels: int, out_channels: int,
                 bias: bool = True, weight_initializer: str | None = None):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.weight_initializer = weight_initializer
        lazy = in_channels is None or in_channels < 0
        self.weight = nn.Parameter(
            torch.empty(out_channels, 0 if lazy else in_channels))
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)
        if not lazy:
            self.reset_parameters()

    def reset_parameters(self):
        if self.weight.size(1) == 0:
            return
        if self.weight_initializer == "glorot":
            glorot_(self.weight)
        else:
            # torch.nn.Linear default (PyG Linear's default path too).
            nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        if self.bias is not None:
            fan_in = self.weight.size(1)
            bound = 1 / math.sqrt(fan_in) if fan_in > 0 else 0
            with torch.no_grad():
                self.bias.uniform_(-bound, bound)

    def _materialize(self, in_channels: int, device=None, dtype=None):
        self.weight.data = torch.empty(self.out_channels, in_channels,
                                       device=device, dtype=dtype)
        self.in_channels = in_channels
        self.reset_parameters()

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        if self.weight.size(1) == 0:
            self._materialize(x.size(-1), x.device, x.dtype)
        return torch.nn.functional.linear(x, self.weight, self.bias)

    def __repr__(self):
        return (f"Linear({self.in_channels}, {self.out_channels}, "
                f"bias={self.bias is not None})")
