"""ctypes bindings for the native C++ batcher (native/batcher.cpp).

Auto-builds the shared library on first use (g++ is in the image; pybind11
is not, hence the C ABI + ctypes).  Falls back cleanly when compilation is
unavailable: ``native_available()`` gates every call site and the numpy
packer remains the reference implementation (tests assert equivalence).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libgraphbatch.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pack_batch.restype = ctypes.c_int
    lib.pack_batch.argtypes = [
        ctypes.c_int32, i64p, i64p, f32p, ctypes.c_int32, i32p, i32p,
        f32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        f32p, i32p, i32p, i32p, i32p, i32p, u8p, u8p, u8p, f32p, f32p,
    ]
    lib.spmm_windows.restype = ctypes.c_int
    lib.spmm_windows.argtypes = [
        i32p, i32p, u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, i32p, i32p, i32p,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype)) if arr is not None \
        else None


def pack_batch_native(graphs, budget, slot_nodes: int | None = None,
                      materialize_dense: bool = False):
    """Native equivalent of batching.pack_batch (graph-level y only).
    Returns a GraphBatch or None if the native library is unavailable.
    ``materialize_dense`` fills the dense adjacency host-side (normally the
    model builds it on device — see ops/dense.build_dense_adj)."""
    lib = _load()
    if lib is None:
        return None
    from graph_hscn_tpu.data.structures import GraphBatch

    G = len(graphs)
    F = graphs[0].x.shape[1]
    node_offsets = np.zeros(G + 1, np.int64)
    edge_offsets = np.zeros(G + 1, np.int64)
    for i, g in enumerate(graphs):
        node_offsets[i + 1] = node_offsets[i] + g.num_nodes
        edge_offsets[i + 1] = edge_offsets[i] + g.num_edges
    node_feat = np.ascontiguousarray(
        np.concatenate([g.x for g in graphs]).astype(np.float32))
    edge_src = np.ascontiguousarray(np.concatenate(
        [g.edge_index[0] for g in graphs]).astype(np.int32))
    edge_dst = np.ascontiguousarray(np.concatenate(
        [g.edge_index[1] for g in graphs]).astype(np.int32))
    has_y = graphs[0].y is not None
    C = int(np.asarray(graphs[0].y).reshape(-1).shape[0]) if has_y else 0
    y = (np.ascontiguousarray(np.stack(
        [np.asarray(g.y, np.float32).reshape(-1) for g in graphs]))
        if has_y else None)

    GP = budget.num_graphs
    E = budget.num_edges
    slot = slot_nodes or 0
    N = (GP - 1) * slot if slot else budget.num_nodes

    out_node_feat = np.empty((N, F), np.float32)
    out_senders = np.empty(E, np.int32)
    out_receivers = np.empty(E, np.int32)
    out_node_graph = np.empty(N, np.int32)
    out_n_node = np.empty(GP, np.int32)
    out_n_edge = np.empty(GP, np.int32)
    out_node_mask = np.empty(N, np.uint8)
    out_edge_mask = np.empty(E, np.uint8)
    out_graph_mask = np.empty(GP, np.uint8)
    out_y = np.empty((GP, C), np.float32) if has_y else None
    out_dense = (np.empty((GP - 1, slot, slot), np.float32)
                 if (slot and materialize_dense) else None)

    rc = lib.pack_batch(
        G, _ptr(node_offsets, ctypes.c_int64),
        _ptr(edge_offsets, ctypes.c_int64),
        _ptr(node_feat, ctypes.c_float), F,
        _ptr(edge_src, ctypes.c_int32), _ptr(edge_dst, ctypes.c_int32),
        _ptr(y, ctypes.c_float), C,
        budget.num_nodes, E, GP, slot,
        _ptr(out_node_feat, ctypes.c_float),
        _ptr(out_senders, ctypes.c_int32),
        _ptr(out_receivers, ctypes.c_int32),
        _ptr(out_node_graph, ctypes.c_int32),
        _ptr(out_n_node, ctypes.c_int32),
        _ptr(out_n_edge, ctypes.c_int32),
        _ptr(out_node_mask, ctypes.c_uint8),
        _ptr(out_edge_mask, ctypes.c_uint8),
        _ptr(out_graph_mask, ctypes.c_uint8),
        _ptr(out_y, ctypes.c_float),
        _ptr(out_dense, ctypes.c_float),
    )
    if rc != 0:
        raise ValueError(f"native pack_batch failed with code {rc}")
    return GraphBatch(
        node_feat=out_node_feat, senders=out_senders,
        receivers=out_receivers, node_graph=out_node_graph,
        n_node=out_n_node, n_edge=out_n_edge,
        node_mask=out_node_mask.astype(bool),
        edge_mask=out_edge_mask.astype(bool),
        graph_mask=out_graph_mask.astype(bool),
        y=out_y, dense_adj=out_dense, slot=slot_nodes,
    )


def spmm_windows_native(senders, receivers, edge_mask, num_nodes: int,
                        tile_edges: int, window: int):
    """Native per-tile window scan for the Pallas SpMM plan.  Returns
    (ws, wr, snd_rel, rcv_rel) or None (unavailable / span too wide)."""
    lib = _load()
    if lib is None:
        return None
    E = senders.shape[0]
    T = E // tile_edges
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    mask = np.ascontiguousarray(edge_mask, np.uint8)
    ws = np.empty(T, np.int32)
    wr = np.empty(T, np.int32)
    snd_rel = np.empty(E, np.int32)
    rcv_rel = np.empty(E, np.int32)
    rc = lib.spmm_windows(
        _ptr(senders, ctypes.c_int32), _ptr(receivers, ctypes.c_int32),
        _ptr(mask, ctypes.c_uint8), E, num_nodes, tile_edges, window,
        _ptr(ws, ctypes.c_int32), _ptr(wr, ctypes.c_int32),
        _ptr(snd_rel, ctypes.c_int32), _ptr(rcv_rel, ctypes.c_int32))
    if rc != 0:
        return None
    return ws, wr, snd_rel.reshape(T, tile_edges), \
        rcv_rel.reshape(T, tile_edges)
