"""Device mesh construction.

The reference has no distributed layer at all (SURVEY §2.4 — its only device
logic is cuda-if-available, main.py:99).  Here parallelism is mesh-first:
every distributed feature addresses a named ``jax.sharding.Mesh`` axis, and
the same code runs on 1 chip, a v5e slice over ICI, or multi-host DCN
(``jax.distributed.initialize`` + the same mesh).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes=("data",), shape=(-1,), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        fixed = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // fixed
    total = int(np.prod(shape))
    if total > n:
        raise ValueError(f"mesh shape {shape} needs {total} devices, "
                         f"have {n}")
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def resolve_mesh_shape(shape) -> list[int]:
    """Resolve a config mesh shape: ``-1`` means "all remaining devices on
    that axis" against the actual device count (config/defaults.py)."""
    shape = list(shape)
    if -1 in shape:
        fixed = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(jax.devices()) // fixed
    return shape


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (stacked per-device) axis."""
    return NamedSharding(mesh, P(axis))
