"""Core batch IR: padded, statically-shaped graph batches.

This is the TPU-native replacement for PyG's ``Data``/``Batch``/``HeteroData``
objects used throughout the reference (see /root/reference/graph_hscn/loader/
loader.py:48-60 and hetero_data.py:14-88).  Instead of ragged per-graph tensors
collated on the fly, a batch of graphs is flattened once on the host into a
single pytree of fixed-shape arrays:

- every batch in a bucket has identical array shapes, so ``jax.jit`` compiles a
  handful of programs total (one per bucket), never one per batch;
- edges are sorted by receiver so sparse aggregation is a segment reduction
  over contiguous runs (CSR), which both XLA and our Pallas kernels exploit;
- the final graph slot / node slot / edge slots are reserved for padding, so
  segment reductions over ``node_graph`` deposit garbage into a dummy row that
  is masked out, rather than corrupting real graphs.

The dense view (`DenseGraphBatch`) re-blocks the same data per-graph as
``[G, n_max, *]`` arrays.  For molecular-scale graphs (LRGB peptides average
~150 nodes) the dense form turns every message-passing step into a batched
MXU matmul, which on TPU is far faster than gather/scatter; the sparse CSR
form is kept for large graphs (e.g. PascalVOC-SP) and for edge-partitioned
multi-chip execution.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = Any  # jnp.ndarray or np.ndarray


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A padded batch of graphs in flattened (CSR-sorted) form.

    Shapes (all static within a bucket):
      N = padded node count, E = padded edge count, G = padded graph count.
      The LAST graph is the padding graph; padding nodes/edges belong to it.

    Attributes:
      node_feat:  [N, F]  node features (float).
      edge_feat:  [E, Fe] edge features, or None.
      senders:    [E]     int32 source node index per edge.
      receivers:  [E]     int32 destination node index per edge; edges are
                          sorted ascending by receiver (padding edges last,
                          pointing at the final padding node).
      edge_weight:[E]     optional float weight per edge (e.g. gcn_norm), or None.
      node_graph: [N]     int32 graph id per node (padding nodes -> G-1).
      n_node:     [G]     int32 real node count per graph.
      n_edge:     [G]     int32 real edge count per graph.
      y:          [G, C]  graph-level targets (or [N, C] for node-level tasks
                          stored in node_y instead).
      node_y:     [N, C]  node-level targets, or None.
      node_mask:  [N]     bool, True for real nodes.
      edge_mask:  [E]     bool, True for real edges.
      graph_mask: [G]     bool, True for real graphs.
      node_pe:    [N, K]  optional positional-encoding features, or None.
      eigvals:    [N, K]  optional Laplacian eigenvalues (broadcast per node).
      eigvecs:    [N, K]  optional Laplacian eigenvectors.
      cluster:    [N]     optional int32 cluster assignment (HSCN), or None.
    """

    node_feat: Array
    senders: Array
    receivers: Array
    node_graph: Array
    n_node: Array
    n_edge: Array
    node_mask: Array
    edge_mask: Array
    graph_mask: Array
    edge_feat: Array | None = None
    edge_weight: Array | None = None
    y: Array | None = None
    node_y: Array | None = None
    node_pe: Array | None = None
    eigvals: Array | None = None
    eigvecs: Array | None = None
    cluster: Array | None = None
    # Optional Pallas SpMM tiling metadata (ops/pallas/spmm_kernel.py),
    # attached host-side by the batcher when enabled.
    spmm: Any | None = None
    # Optional dense per-graph adjacency [G-1, slot, slot] for the slotted
    # dense execution path: when the batcher packs every graph into a
    # fixed-size node slot (N == (G-1)*slot), flat<->blocked conversion is
    # a reshape and conv layers run as batched MXU matmuls.  Usually left
    # None and built ON DEVICE from the edge list (ops/dense.py
    # build_dense_adj) — host->device bandwidth is precious and the [G,
    # slot^2] array is ~100x the edge list.
    dense_adj: Array | None = None
    # Slot width of the slotted layout; static (part of the jit cache key).
    slot: int | None = dataclasses.field(default=None,
                                         metadata=dict(static=True))

    @property
    def slot_size(self) -> int | None:
        if self.slot is not None:
            return self.slot
        return None if self.dense_adj is None else self.dense_adj.shape[-1]

    # ---- static helpers -------------------------------------------------
    @property
    def num_nodes_padded(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs_padded(self) -> int:
        return self.n_node.shape[0]

    def replace(self, **kw) -> "GraphBatch":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseGraphBatch:
    """Per-graph dense view: everything is a batched fixed-size block.

    Message passing over this view is a batched dense matmul
    (``adj @ x``) that maps directly onto the MXU.  Built from a
    ``GraphBatch`` by :func:`graph_hscn_tpu.data.batching.to_dense`.

    Attributes:
      x:         [G, n_max, F]   node features, zero-padded.
      adj:       [G, n_max, n_max] dense adjacency (weighted if edge_weight).
      node_mask: [G, n_max]      bool.
      y:         [G, C].
      graph_mask:[G]             bool.
      n_node:    [G]             int32.
    """

    x: Array
    adj: Array
    node_mask: Array
    n_node: Array
    graph_mask: Array
    y: Array | None = None

    @property
    def max_nodes(self) -> int:
        return self.x.shape[1]

    def replace(self, **kw) -> "DenseGraphBatch":
        return dataclasses.replace(self, **kw)


def batch_size_info(batch: GraphBatch) -> str:
    return (
        f"GraphBatch(N={batch.num_nodes_padded}, E={batch.num_edges_padded}, "
        f"G={batch.num_graphs_padded}, F={batch.node_feat.shape[-1]})"
    )


# Fields that participate in sharding over the batch ("data") axis.
NODE_AXIS_FIELDS = ("node_feat", "node_graph", "node_mask", "node_y", "node_pe",
                    "eigvals", "eigvecs", "cluster")
EDGE_AXIS_FIELDS = ("senders", "receivers", "edge_feat", "edge_weight", "edge_mask")
GRAPH_AXIS_FIELDS = ("n_node", "n_edge", "y", "graph_mask")


def as_numpy(batch: GraphBatch) -> GraphBatch:
    return jax.tree_util.tree_map(np.asarray, batch)
