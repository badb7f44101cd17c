"""Edge-partitioned message passing across a device mesh — the graph-domain
analog of tensor/sequence parallelism (SURVEY §2.4, BASELINE north star).

A single large graph (or a batch too big for one chip) is sharded by
*contiguous node blocks*: device d owns node rows [d*Nb, (d+1)*Nb) of the
feature array and every edge whose RECEIVER lies in its block.  Senders may
live on other devices, so aggregation needs their features ("halo"):

  v1 (this module): all-gather the node features over ICI, aggregate
      locally into owned rows.  One collective per layer; simple, always
      correct, bandwidth = N*F per device per layer.
  v2 (planned): targeted all_to_all of only boundary nodes, overlapped
      with local aggregation via async collectives + the Pallas SpMM on the
      local block.

The pooled MinCUT contractions (S^T A S, S^T X — reference hscn.py:63) are
sharded the same way: each device contracts its node block and a psum
completes the global result (``sharded_mincut_contractions``).

All functions are shard_map programs over a named mesh axis; tests verify
bitwise-level equivalence with the single-device computation on the
8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_hscn_tpu.ops.segment import segment_sum


def partition_edges_by_receiver(senders: np.ndarray, receivers: np.ndarray,
                                edge_mask: np.ndarray, num_nodes: int,
                                num_devices: int):
    """Host-side: split edges into per-device groups by receiver block.

    Returns (senders [D, Eb], receivers_local [D, Eb], mask [D, Eb],
    block_size) with per-device edge arrays padded to a common length
    (padding edges point at local row 0 with mask False).
    """
    assert num_nodes % num_devices == 0, (
        f"num_nodes {num_nodes} must divide evenly across {num_devices} "
        "devices — pad the batch budget accordingly")
    nb = num_nodes // num_devices
    owner = receivers // nb
    eids = np.arange(senders.shape[0], dtype=np.int32)
    groups_s, groups_r, groups_m, groups_e = [], [], [], []
    for d in range(num_devices):
        sel = (owner == d) & edge_mask
        groups_s.append(senders[sel])
        groups_r.append(receivers[sel] - d * nb)
        groups_m.append(np.ones(sel.sum(), bool))
        groups_e.append(eids[sel])
    eb = max(len(g) for g in groups_s)
    eb = ((eb + 127) // 128) * 128 if eb else 128
    D = num_devices
    out_s = np.zeros((D, eb), np.int32)
    out_r = np.zeros((D, eb), np.int32)
    out_m = np.zeros((D, eb), bool)
    out_e = np.zeros((D, eb), np.int32)
    for d in range(D):
        k = len(groups_s[d])
        out_s[d, :k] = groups_s[d]
        out_r[d, :k] = groups_r[d]
        out_m[d, :k] = groups_m[d]
        out_e[d, :k] = groups_e[d]
    return out_s, out_r, out_m, nb, out_e


def make_sharded_spmm(mesh: Mesh, axis: str = "data"):
    """Builds f(x_blocks [D, Nb, F], snd [D, Eb], rcv_local [D, Eb],
    mask [D, Eb]) -> out_blocks [D, Nb, F] computing the global
    out[i] = sum_{e->i} x[send[e]] with receiver-owned aggregation."""

    def per_device(x_blk, snd, rcv_local, mask):
        x_blk = x_blk[0]          # [Nb, F]
        snd = snd[0]
        rcv_local = rcv_local[0]
        mask = mask[0]
        nb = x_blk.shape[0]
        # Halo: gather the full node array (v1; v2 = targeted all_to_all).
        x_full = jax.lax.all_gather(x_blk, axis, tiled=True)   # [N, F]
        msgs = jnp.take(x_full, snd, axis=0)
        msgs = jnp.where(mask[:, None], msgs, 0.0)
        out = segment_sum(msgs, rcv_local, nb)
        return out[None]

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    ))


def plan_halo_exchange(senders: np.ndarray, receivers: np.ndarray,
                       edge_mask: np.ndarray, num_nodes: int,
                       num_devices: int):
    """Host-side plan for the targeted (v2) halo exchange.

    For each (owner o, needer d) pair, the set of o-local node ids whose
    features d needs (senders of d's edges living in o's block), padded to a
    uniform halo width H.  Each device's edge senders are remapped to point
    into ``concat([own block, halo buffer])``.

    Returns dict with:
      send_idx   [D, D, H]  local ids device o sends to device d
                            (row o = what o sends, one slot per dest)
      snd_remap  [D, Eb]    per-device sender index into [Nb + D*H] rows
      rcv_local  [D, Eb], mask [D, Eb], block_size, halo_width
    plus the local/halo SPLIT of the same edges (v3 overlap path —
    local-sender edges have no data dependency on the all_to_all, so XLA's
    latency-hiding scheduler can run the collective concurrently with the
    local aggregation):
      snd_loc [D, El], rcv_loc [D, El], mask_loc [D, El]   (own-block ids)
      snd_hal [D, Eh], rcv_hal [D, Eh], mask_hal [D, Eh]   (halo-table ids)
    plus ``eidx_loc [D, El]`` / ``eidx_hal [D, Eh]``: each group edge's
    index into the ORIGINAL edge array, so per-edge data (edge features
    for GatedGCN) can be gathered into the same per-device layout.
    """
    assert num_nodes % num_devices == 0
    nb = num_nodes // num_devices
    D = num_devices
    snd_d, rcv_d, mask_d, _, eidx_d = partition_edges_by_receiver(
        senders, receivers, edge_mask, num_nodes, D)
    eb = snd_d.shape[1]

    # needed[d][o] = sorted unique global ids in o's block needed by d;
    # o == d is empty (own-block senders are read locally, no exchange).
    needed = [[np.unique(snd_d[d][(mask_d[d]) &
                                  (snd_d[d] // nb == o)])
               if o != d else np.zeros((0,), np.int64)
               for o in range(D)] for d in range(D)]
    H = max((len(ids) for row in needed for ids in row), default=1)
    H = max(((H + 7) // 8) * 8, 8)

    send_idx = np.zeros((D, D, H), np.int32)
    for d in range(D):
        for o in range(D):
            ids = needed[d][o]
            send_idx[o, d, :len(ids)] = ids - o * nb   # o-local ids

    # Remap each device's senders into [own Nb | halo D*H] row space.
    # Vectorized per (needer, owner) pair: ``needed[d][o]`` is sorted
    # unique, so the halo slot of every edge sender is one searchsorted —
    # O(D^2 + E log H) instead of a per-edge Python loop (matters at
    # giant-graph scale: hundreds of thousands of edges per split).
    snd_remap = np.zeros((D, eb), np.int32)
    for d in range(D):
        snd = snd_d[d]
        m = mask_d[d]
        owner_of = snd // nb
        own = m & (owner_of == d)
        snd_remap[d, own] = snd[own] - d * nb
        for o in range(D):
            if o == d:
                continue
            sel = m & (owner_of == o)
            if not sel.any():
                continue
            slots = np.searchsorted(needed[d][o], snd[sel])
            snd_remap[d, sel] = nb + o * H + slots
    plan = dict(send_idx=send_idx, snd_remap=snd_remap, rcv_local=rcv_d,
                mask=mask_d, block_size=nb, halo_width=H)
    plan.update(_split_local_halo(snd_remap, rcv_d, mask_d, nb, eidx_d))
    return plan


def local_spmm_plans(plan: dict, block_size: int):
    """Stacked per-device Pallas SpMM plans for the LOCAL-sender edge
    groups of a halo-exchange plan (leading device axis on every leaf, so
    the pytree rides through shard_map under a single P(axis) prefix
    spec).  Per-device local edges keep the batch's receiver-sorted order
    (partition + split preserve order), which is what keeps tile spans
    inside the kernel windows.  Returns None when any device's block
    violates the window constraints — callers keep the XLA segment-sum
    path (SURVEY §2.4: "targeted all_to_all ... overlap with local
    aggregation (async collective + Pallas compute)")."""
    import jax.tree_util as jtu

    from graph_hscn_tpu.ops.pallas.spmm_kernel import (PLAN_CANDIDATES,
                                                       spmm_plan)

    D = plan["snd_loc"].shape[0]
    Eb = plan["snd_loc"].shape[1]
    # One (tile_edges, window) pair must serve EVERY device (the stacked
    # pytree needs uniform leaf shapes); sweep the measured preference
    # order (spmm_kernel.PLAN_CANDIDATES — (1024, 512) won the on-chip
    # sweep; the old fixed (256, 1024) default left ~1.4x on the table)
    # and keep the first pair feasible for all blocks.  spmm_plan_auto's
    # tiny-batch guard applies per device: don't pad a small edge group
    # up several-fold to fill one wide tile.
    cands = [c for c in PLAN_CANDIDATES if c[0] <= Eb]
    if not cands:
        cands = [PLAN_CANDIDATES[-1]]
    for te, window in cands:
        per_dev = []
        for d in range(D):
            p = spmm_plan(plan["snd_loc"][d], plan["rcv_loc"][d],
                          plan["mask_loc"][d], block_size,
                          tile_edges=te, window=window)
            if p is None:
                break
            per_dev.append(p)
        if len(per_dev) == D:
            return jtu.tree_map(lambda *xs: jnp.asarray(np.stack(xs)),
                                *per_dev)
    return None


def locality_reorder(senders: np.ndarray, receivers: np.ndarray,
                     edge_mask: np.ndarray, num_nodes: int,
                     node_mask: np.ndarray | None = None) -> np.ndarray:
    """Cuthill-McKee node reordering to shrink the halo exchange.

    Contiguous-block partitioning means halo volume is set entirely by the
    node ordering: an edge is "halo" iff its endpoints land in different
    blocks.  A BFS (Cuthill-McKee) order clusters each neighborhood into a
    narrow index band, so far fewer edges straddle block boundaries and
    ``plan_halo_exchange``'s halo width H (which sets the per-layer
    all_to_all volume D*H*F) drops accordingly.  The reference has no
    analog (it is single-device, SURVEY §2.4); this is pure TPU-systems
    work on the host-side partition plan.

    Runs scipy's sparse-graph reverse Cuthill-McKee (C-compiled BFS with
    degree-ordered neighbor visits) on the real-node subgraph — setup is
    O(E) instead of a per-node Python loop, which matters on the
    giant-graph node-classification workloads this path exists for.
    Padding nodes (node_mask False) are appended at the end, keeping real
    nodes compact.

    Returns ``perm`` with ``perm[new_id] = old_id`` (a bijection over
    ``num_nodes``); apply with :func:`apply_node_reorder`.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    em = np.asarray(edge_mask, bool)
    s = np.asarray(senders)[em].astype(np.int64)
    r = np.asarray(receivers)[em].astype(np.int64)
    real = (np.ones(num_nodes, bool) if node_mask is None
            else np.asarray(node_mask, bool))
    real_ids = np.flatnonzero(real)
    compact = np.full(num_nodes, -1, np.int64)
    compact[real_ids] = np.arange(real_ids.size)
    keep = real[s] & real[r]
    cs, cr = compact[s[keep]], compact[r[keep]]
    if real_ids.size:
        adj = sp.csr_matrix(
            (np.ones(2 * cs.size, np.int8),
             (np.concatenate([cs, cr]), np.concatenate([cr, cs]))),
            shape=(real_ids.size, real_ids.size))
        order = reverse_cuthill_mckee(adj, symmetric_mode=True)
        perm_real = real_ids[np.asarray(order, np.int64)]
    else:
        perm_real = real_ids
    return np.concatenate([perm_real, np.flatnonzero(~real)])


def apply_node_reorder(perm: np.ndarray, senders: np.ndarray,
                       receivers: np.ndarray, *node_arrays):
    """Apply a ``perm[new] = old`` node permutation: edge endpoints are
    remapped through the inverse, node-indexed arrays gathered into the
    new order.  Masked (padding) edge endpoints map like any other id —
    they stay in range and are gated by edge_mask downstream.

    NOTE: edge ORDER is unchanged — after remapping it is no longer
    sorted by (new) receiver, which the Pallas SpMM plans require; call
    :func:`sort_edges_by_receiver` afterwards (round-4 fix: every
    ``reorder=True`` run had silently lost plan eligibility and fallen
    back to XLA aggregation)."""
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    new_s = inv[np.asarray(senders)].astype(np.int32)
    new_r = inv[np.asarray(receivers)].astype(np.int32)
    return (new_s, new_r) + tuple(np.asarray(a)[perm] for a in node_arrays)


def sort_edges_by_receiver(senders: np.ndarray, receivers: np.ndarray,
                           edge_mask: np.ndarray, num_nodes: int):
    """Stable receiver sort with masked edges last — restores the
    batcher's edge-order invariant after :func:`apply_node_reorder`
    (receiver-sorted per-device edge groups are what keep tile spans
    inside the SpMM kernel windows, spmm_kernel.py _windows).

    Returns (senders, receivers, edge_mask, edge_perm) with
    ``edge_perm[new_pos] = old_pos``; any per-edge side arrays (edge
    features, stored edge indices) must be composed through it.
    """
    em = np.asarray(edge_mask, bool)
    key = np.where(em, np.asarray(receivers), num_nodes)
    eo = np.argsort(key, kind="stable").astype(np.int32)
    return (np.asarray(senders)[eo], np.asarray(receivers)[eo], em[eo],
            eo)


def _split_local_halo(snd_remap, rcv_local, mask, nb, eidx):
    """Split each device's edges into local-sender (id < Nb) and
    halo-sender groups, padded separately to 128-multiples.  Also carries
    each edge's original-array index (for per-edge feature gathers)."""
    D = snd_remap.shape[0]
    groups = {"loc": ([], [], []), "hal": ([], [], [])}
    for d in range(D):
        m = mask[d]
        is_loc = (snd_remap[d] < nb) & m
        is_hal = (snd_remap[d] >= nb) & m
        groups["loc"][0].append(snd_remap[d][is_loc])
        groups["loc"][1].append(rcv_local[d][is_loc])
        groups["loc"][2].append(eidx[d][is_loc])
        groups["hal"][0].append(snd_remap[d][is_hal] - nb)
        groups["hal"][1].append(rcv_local[d][is_hal])
        groups["hal"][2].append(eidx[d][is_hal])

    def pad(ss, rr, ee):
        e = max(max((len(g) for g in ss), default=0), 1)
        e = ((e + 127) // 128) * 128
        s = np.zeros((D, e), np.int32)
        r = np.zeros((D, e), np.int32)
        mk = np.zeros((D, e), bool)
        ei = np.zeros((D, e), np.int32)
        for d in range(D):
            k = len(ss[d])
            s[d, :k] = ss[d]
            r[d, :k] = rr[d]
            mk[d, :k] = True
            ei[d, :k] = ee[d]
        return s, r, mk, ei

    ls, lr, lm, le = pad(*groups["loc"])
    hs, hr, hm, he = pad(*groups["hal"])
    return dict(snd_loc=ls, rcv_loc=lr, mask_loc=lm, eidx_loc=le,
                snd_hal=hs, rcv_hal=hr, mask_hal=hm, eidx_hal=he)


def make_sharded_spmm_halo(mesh: Mesh, axis: str = "data"):
    """v2 sharded SpMM: all_to_all of only the halo node features
    (plan from :func:`plan_halo_exchange`), then local aggregation.

    Comms per layer: D * H * F per device (vs N * F for the v1
    all-gather), where H = max boundary size."""

    def per_device(x_blk, send_idx, snd_remap, rcv_local, mask):
        x_blk = x_blk[0]           # [Nb, F]
        send_idx = send_idx[0]     # [D, H] rows to send, one per dest
        snd_remap = snd_remap[0]
        rcv_local = rcv_local[0]
        mask = mask[0]
        nb = x_blk.shape[0]
        # Features to ship: [D, H, F]; slot d = what I send to device d.
        outbound = jnp.take(x_blk, send_idx, axis=0)
        # all_to_all: swap so inbound[o] = what device o sent me.
        inbound = jax.lax.all_to_all(outbound, axis, split_axis=0,
                                     concat_axis=0, tiled=False)
        halo = inbound.reshape(-1, x_blk.shape[-1])    # [D*H, F]
        table = jnp.concatenate([x_blk, halo], axis=0)
        msgs = jnp.take(table, snd_remap, axis=0)
        msgs = jnp.where(mask[:, None], msgs, 0.0)
        out = segment_sum(msgs, rcv_local, nb)
        return out[None]

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    ))


def make_sharded_spmm_overlap(mesh: Mesh, axis: str = "data"):
    """v3 sharded SpMM: the halo all_to_all is issued FIRST and consumed
    LAST, with the local-sender aggregation (the bulk of the edges for a
    well-partitioned graph) in between.  Neither depends on the other, so
    XLA's latency-hiding scheduler runs the collective concurrently with
    the local segment-sum — the communication cost is hidden behind
    compute instead of serializing with it (ROADMAP item: halo overlap).

    Numerically identical to make_sharded_spmm_halo (same edges, same
    additions up to float reassociation across the two groups)."""

    def per_device(x_blk, send_idx, snd_loc, rcv_loc, m_loc,
                   snd_hal, rcv_hal, m_hal):
        x_blk = x_blk[0]
        send_idx = send_idx[0]
        snd_loc, rcv_loc, m_loc = snd_loc[0], rcv_loc[0], m_loc[0]
        snd_hal, rcv_hal, m_hal = snd_hal[0], rcv_hal[0], m_hal[0]
        nb = x_blk.shape[0]
        # 1) Launch the exchange (no dependency on the local aggregation).
        outbound = jnp.take(x_blk, send_idx, axis=0)       # [D, H, F]
        inbound = jax.lax.all_to_all(outbound, axis, split_axis=0,
                                     concat_axis=0, tiled=False)
        # 2) Local-sender edges aggregate while the collective flies.
        msgs = jnp.where(m_loc[:, None], jnp.take(x_blk, snd_loc, axis=0),
                         0.0)
        out = segment_sum(msgs, rcv_loc, nb)
        # 3) Consume the halo.
        halo = inbound.reshape(-1, x_blk.shape[-1])        # [D*H, F]
        msgs_h = jnp.where(m_hal[:, None], jnp.take(halo, snd_hal, axis=0),
                           0.0)
        return (out + segment_sum(msgs_h, rcv_hal, nb))[None]

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis),) * 8,
        out_specs=P(axis),
        check_vma=False,
    ))


def make_sharded_mincut_contractions(mesh: Mesh, axis: str = "data"):
    """Builds f(s_blocks [D, Nb, K], x_blocks [D, Nb, F], adj arrays) ->
    (s_t_x [K, F], s_t_a_s [K, K]) — the pooled contractions of MinCUT
    pooling as sharded matmuls + psum (replaces dense_mincut_pool's
    single-device einsums, reference hscn.py:63)."""

    def per_device(s_blk, x_blk, snd, rcv_local, mask):
        s_blk = s_blk[0]              # [Nb, K]
        x_blk = x_blk[0]              # [Nb, F]
        snd = snd[0]
        rcv_local = rcv_local[0]
        mask = mask[0]
        nb = s_blk.shape[0]
        # S^T X: local contraction + psum.
        stx = jax.lax.psum(s_blk.T @ x_blk, axis)              # [K, F]
        # S^T A S: (A S) rows owned by receiver; A S = spmm over S.
        s_full = jax.lax.all_gather(s_blk, axis, tiled=True)   # [N, K]
        msgs = jnp.take(s_full, snd, axis=0)
        msgs = jnp.where(mask[:, None], msgs, 0.0)
        a_s = segment_sum(msgs, rcv_local, nb)                 # [Nb, K]
        stas = jax.lax.psum(s_blk.T @ a_s, axis)               # [K, K]
        return stx[None], stas[None]

    def wrapper(s_blocks, x_blocks, snd, rcv_local, mask):
        stx, stas = _f(s_blocks, x_blocks, snd, rcv_local, mask)
        return stx[0], stas[0]

    _f = jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    ))
    return wrapper


def shard_arrays(mesh: Mesh, *arrays, axis: str = "data"):
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)
