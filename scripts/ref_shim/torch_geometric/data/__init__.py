"""Data / HeteroData / InMemoryDataset stand-ins.

Surface = what the reference touches:

- ``Data`` attribute store with ``None`` for missing keys (PyG-1.x
  semantics; train_clustering.py:37-42 requires it), ``num_nodes`` /
  ``num_features``, ``is_undirected()`` (loader.py:78), ``.to(device)``,
  str indexing (loader.py:29 ``dataset.data[name] = value``).
- ``InMemoryDataset`` with raw/processed dirs, download()/process()
  triggering (peptides_functional.py:45-46 then loads
  ``processed_paths[0]``), ``collate`` (classmethod, :104), integer /
  slice / index-tensor ``__getitem__`` (loader.py:78,98,103;
  hetero_data.py:26-28), iteration (train_clustering.py:36).
- ``HeteroData`` with per-type storages via ``h_data["local"].x = ...``
  and triplet relations (hetero_data.py:63-86).
- ``download_url`` import-satisfying stub (never runs: the parity driver
  pre-seeds the processed cache).
"""

from __future__ import annotations

import os

import torch


def download_url(url: str, folder: str):
    raise RuntimeError(
        "download_url stub reached: no network egress. The parity driver "
        "must pre-seed the processed dataset cache.")


class Data:
    """Minimal PyG-style graph container: a plain attribute store.

    Missing attributes resolve to ``None`` (the PyG-1.x behavior the
    reference depends on); dunder lookups raise so pickling and copying
    behave normally.
    """

    def __init__(self, x=None, edge_index=None, edge_attr=None, y=None,
                 **kwargs):
        if x is not None:
            self.x = x
        if edge_index is not None:
            self.edge_index = edge_index
        if edge_attr is not None:
            self.edge_attr = edge_attr
        if y is not None:
            self.y = y
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __getattr__(self, key):
        if key.startswith("__") and key.endswith("__"):
            raise AttributeError(key)
        return None

    def __setitem__(self, key, value):
        setattr(self, key, value)

    def __getitem__(self, key):
        return getattr(self, key)

    def __contains__(self, key):
        return key in self.__dict__

    @property
    def keys(self):
        return list(self.__dict__.keys())

    @property
    def num_nodes(self):
        if "__num_nodes__" in self.__dict__:
            return int(self.__dict__["__num_nodes__"])
        if self.x is not None:
            return int(self.x.size(0))
        if self.edge_index is not None and self.edge_index.numel():
            return int(self.edge_index.max().item()) + 1
        return 0

    @property
    def num_edges(self):
        return (int(self.edge_index.size(1))
                if self.edge_index is not None else 0)

    @property
    def num_features(self):
        return int(self.x.size(1)) if self.x is not None else 0

    def is_undirected(self) -> bool:
        ei = self.edge_index
        if ei is None or ei.numel() == 0:
            return True
        n = self.num_nodes
        fwd = (ei[0] * n + ei[1]).sort().values
        rev = (ei[1] * n + ei[0]).sort().values
        return bool(torch.equal(fwd, rev))

    def to(self, device):
        for k, v in self.__dict__.items():
            if torch.is_tensor(v):
                self.__dict__[k] = v.to(device)
        return self

    def __repr__(self):
        parts = []
        for k, v in self.__dict__.items():
            if torch.is_tensor(v):
                parts.append(f"{k}={list(v.shape)}")
        return f"{type(self).__name__}({', '.join(parts)})"


class _HeteroStorage(Data):
    """One node-type or edge-type store of a HeteroData."""


class HeteroData:
    """Hetero graph: ``h["local"].x``, ``h["local","to","virtual"].edge_index``
    (hetero_data.py:63-86); type dicts consumed by HSCN.forward
    (hscn.py:102-111)."""

    def __init__(self):
        self._node_stores: dict[str, _HeteroStorage] = {}
        self._edge_stores: dict[tuple, _HeteroStorage] = {}

    def __getitem__(self, key):
        if isinstance(key, tuple):
            key = tuple(key)
            if key not in self._edge_stores:
                self._edge_stores[key] = _HeteroStorage()
            return self._edge_stores[key]
        if key not in self._node_stores:
            self._node_stores[key] = _HeteroStorage()
        return self._node_stores[key]

    @property
    def node_types(self):
        return list(self._node_stores.keys())

    @property
    def edge_types(self):
        return list(self._edge_stores.keys())

    @property
    def x_dict(self):
        return {t: s.x for t, s in self._node_stores.items()}

    @property
    def edge_index_dict(self):
        return {t: s.edge_index for t, s in self._edge_stores.items()}

    def to(self, device):
        for s in list(self._node_stores.values()) + list(
                self._edge_stores.values()):
            s.to(device)
        return self


def collate(data_list):
    """Pack a list of Data into one storage Data + a slices dict, the layout
    ``InMemoryDataset.collate`` pickles (peptides_functional.py:104-106).

    Unlike real PyG, edge_index is stored per-graph-local (no cumulative
    node offsets); ``separate``/``get`` below is the only reader of this
    format, so internal consistency is what matters.
    """
    keys = [k for k in data_list[0].__dict__ if
            torch.is_tensor(data_list[0].__dict__[k])]
    data, slices = Data(), {}
    for key in keys:
        cat_dim = 1 if key == "edge_index" else 0
        vals = [d[key] for d in data_list]
        data[key] = torch.cat(vals, dim=cat_dim)
        sizes = torch.tensor([0] + [v.size(cat_dim) for v in vals])
        slices[key] = torch.cumsum(sizes, 0)
    return data, slices


def separate(data, slices, idx, num_graphs):
    """Inverse of ``collate`` for one graph index.

    Keys whose slices length is not num_graphs+1 are dataset-level
    attributes injected by loader.py:22-31 (e.g. ``train_graph_index``)
    — skipped here; loader.py:97-103 consumes them directly off ``.data``.
    """
    out = Data()
    for key, sl in slices.items():
        val = getattr(data, key)
        if val is None or len(sl) != num_graphs + 1:
            continue
        s, e = int(sl[idx]), int(sl[idx + 1])
        if key == "edge_index":
            out[key] = val[:, s:e]
        else:
            out[key] = val[s:e]
    return out


class InMemoryDataset:
    def __init__(self, root, transform=None, pre_transform=None):
        self.root = str(root)
        self.transform = transform
        self.pre_transform = pre_transform
        self.data = None
        self.slices = None
        self._data_list = None
        if not all(os.path.exists(p) for p in self.processed_paths):
            os.makedirs(self.raw_dir, exist_ok=True)
            os.makedirs(self.processed_dir, exist_ok=True)
            if not all(os.path.exists(p) for p in self.raw_paths):
                self.download()
            self.process()

    # -- paths ---------------------------------------------------------
    @property
    def raw_dir(self):
        return os.path.join(self.root, "raw")

    @property
    def processed_dir(self):
        return os.path.join(self.root, "processed")

    @staticmethod
    def _as_list(v):
        return [v] if isinstance(v, str) else list(v)

    @property
    def raw_paths(self):
        return [os.path.join(self.raw_dir, f)
                for f in self._as_list(self.raw_file_names)]

    @property
    def processed_paths(self):
        return [os.path.join(self.processed_dir, f)
                for f in self._as_list(self.processed_file_names)]

    # -- collation -----------------------------------------------------
    @classmethod
    def collate(cls, data_list):
        return collate(data_list)

    # -- indexing ------------------------------------------------------
    def __len__(self):
        if self.slices is None:
            return 0
        for key in ("x", "y"):
            if key in self.slices:
                return len(self.slices[key]) - 1
        return len(next(iter(self.slices.values()))) - 1

    def get(self, idx):
        d = separate(self.data, self.slices, int(idx), len(self))
        return d if self.transform is None else self.transform(d)

    def __getitem__(self, idx):
        if isinstance(idx, int):
            return self.get(idx)
        if isinstance(idx, slice):
            return [self.get(i) for i in range(*idx.indices(len(self)))]
        if torch.is_tensor(idx):
            idx = idx.tolist()
        return [self.get(int(i)) for i in idx]

    def __iter__(self):
        for i in range(len(self)):
            yield self.get(i)

    def download(self):
        raise NotImplementedError

    def process(self):
        raise NotImplementedError
