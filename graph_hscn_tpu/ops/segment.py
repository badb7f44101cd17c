"""Segment reductions over nodes/edges — the TPU replacement for
torch_scatter (reference mpnn.py:8,60; signnet.py:6,255).

All functions take static ``num_segments`` so shapes stay compile-time
constant.  Edges in a GraphBatch are sorted by receiver, so reductions over
``receivers`` pass ``indices_are_sorted=True``, which lets XLA lower to a
faster sorted-segment implementation on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int,
                indices_are_sorted: bool = False):
    return jax.ops.segment_sum(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data, segment_ids, num_segments: int,
                 indices_are_sorted: bool = False):
    """Mean with empty segments -> 0 (matches torch_scatter.scatter_mean)."""
    totals = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    counts = segment_sum(jnp.ones((data.shape[0],), dtype=data.dtype),
                         segment_ids, num_segments, indices_are_sorted)
    counts = jnp.maximum(counts, 1)
    return totals / counts.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments: int,
                indices_are_sorted: bool = False):
    return jax.ops.segment_max(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_softmax(logits, segment_ids, num_segments: int,
                    indices_are_sorted: bool = False,
                    mask=None):
    """Numerically-stable softmax within segments (GAT attention over ragged
    incoming-edge neighborhoods; replaces PyG's ``softmax`` utility).

    `mask`: optional bool [E]; masked-out entries get weight 0 and do not
    contribute to the normalizer.
    """
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    maxes = segment_max(logits, segment_ids, num_segments, indices_are_sorted)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    shifted = logits - maxes[segment_ids]
    exp = jnp.where(jnp.isfinite(shifted), jnp.exp(shifted), 0.0)
    denom = segment_sum(exp, segment_ids, num_segments, indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]


def graph_readout_mean(node_values, node_graph, num_graphs: int):
    """scatter_mean over the batch vector — the MPNN readout
    (reference mpnn.py:60). Padding nodes land in the dummy final graph."""
    return segment_mean(node_values, node_graph, num_graphs,
                        indices_are_sorted=True)


def graph_readout_sum(node_values, node_graph, num_graphs: int):
    return segment_sum(node_values, node_graph, num_graphs,
                       indices_are_sorted=True)
