"""Batch collation for the shim DataLoader.

Homogeneous batches back the MPNN path (train.py:73-98: ``batch.x``,
``batch.edge_index``, ``batch.batch``, ``batch.y``); hetero batches back
the HSCN path (train.py:74-77: ``batch.x_dict``, ``batch.edge_index_dict``,
``batch["local"].y``, ``batch["local"].batch``).  Follows PyG's collation
rules: node-dim tensors concatenate, edge_index gets per-graph node
offsets, graph-level ``y`` rows stack.
"""

from __future__ import annotations

import torch

from . import Data, HeteroData, _HeteroStorage


class Batch(Data):
    @classmethod
    def from_data_list(cls, data_list):
        if isinstance(data_list[0], HeteroData):
            return HeteroBatch.from_data_list(data_list)
        batch = cls()
        batch._src_list = list(data_list)
        n_nodes = [d.num_nodes for d in data_list]
        offsets = torch.tensor([0] + n_nodes).cumsum(0)
        keys = [k for k, v in data_list[0].__dict__.items()
                if torch.is_tensor(v)]
        for key in keys:
            vals = [d[key] for d in data_list]
            if key == "edge_index":
                vals = [v + offsets[i] for i, v in enumerate(vals)]
                batch[key] = torch.cat(vals, dim=1)
            else:
                batch[key] = torch.cat(vals, dim=0)
        batch.batch = torch.repeat_interleave(
            torch.arange(len(data_list)), torch.tensor(n_nodes))
        batch.ptr = offsets
        return batch

    def to_data_list(self):
        """Separate the batch back into per-graph Data objects from the
        CURRENT batched storage (PyG semantics): mutations made on the
        batch — e.g. SignNetNodeEncoder overwriting ``batch.x`` with the
        PE-concatenated features, train.py:29-51 — must be visible in
        the separated graphs, so slicing the batched tensors (not
        returning the stale source list) is load-bearing for the PE
        path."""
        n_graphs = self.num_graphs
        n_total = int(self.ptr[-1])
        e_counts = [d.num_edges for d in self._src_list]
        e_ptr = torch.tensor([0] + e_counts).cumsum(0)
        out = []
        for i in range(n_graphs):
            n0, n1 = int(self.ptr[i]), int(self.ptr[i + 1])
            e0, e1 = int(e_ptr[i]), int(e_ptr[i + 1])
            d = Data()
            for key, v in self.__dict__.items():
                if key in ("_src_list", "batch", "ptr") or \
                        not torch.is_tensor(v):
                    continue
                if key == "edge_index":
                    d[key] = v[:, e0:e1] - n0
                elif key in ("edge_attr",) or (
                        v.size(0) == int(e_ptr[-1]) and
                        v.size(0) != n_total and v.size(0) != n_graphs):
                    d[key] = v[e0:e1]
                elif v.size(0) == n_total:
                    d[key] = v[n0:n1]
                elif v.size(0) == n_graphs:
                    d[key] = v[i:i + 1]
                else:
                    d[key] = v
            out.append(d)
        return out

    @property
    def num_graphs(self):
        return int(self.ptr.numel()) - 1


class HeteroBatch(HeteroData):
    @classmethod
    def from_data_list(cls, data_list):
        batch = cls()
        node_types = data_list[0].node_types
        edge_types = data_list[0].edge_types
        offsets = {}
        for t in node_types:
            counts = [d[t].x.size(0) for d in data_list]
            offsets[t] = torch.tensor([0] + counts).cumsum(0)
            store: _HeteroStorage = batch[t]
            store.x = torch.cat([d[t].x for d in data_list], dim=0)
            store.batch = torch.repeat_interleave(
                torch.arange(len(data_list)), torch.tensor(counts))
            store.ptr = offsets[t]
            ys = [d[t].y for d in data_list if d[t].y is not None]
            if ys:
                store.y = torch.cat(ys, dim=0)
        for et in edge_types:
            src, _, dst = et
            parts = []
            for i, d in enumerate(data_list):
                ei = d[et].edge_index
                parts.append(torch.stack(
                    [ei[0] + offsets[src][i], ei[1] + offsets[dst][i]]))
            batch[et].edge_index = torch.cat(parts, dim=1)
        return batch
