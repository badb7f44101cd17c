"""Cuthill-McKee locality reordering for the edge-partitioned path:
permutation validity, halo-width reduction, and end-to-end invariance of
the sharded GCN forward under the reorder."""

import jax
import numpy as np

from graph_hscn_tpu.parallel.edge_partition import (apply_node_reorder,
                                                    locality_reorder,
                                                    plan_halo_exchange)
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import (init_sharded_gcn_params,
                                                 make_sharded_gcn,
                                                 shard_node_blocks)


def _ring_of_cliques(num_cliques=32, clique=8, seed=3, shuffle=True):
    """Locality-rich graph (cliques chained in a ring) whose node ids are
    randomly shuffled — the worst case for contiguous-block partitioning,
    the best case for a BFS reordering."""
    n = num_cliques * clique
    edges = []
    for c in range(num_cliques):
        base = c * clique
        for i in range(clique):
            for j in range(clique):
                if i != j:
                    edges.append((base + i, base + j))
        nxt = ((c + 1) % num_cliques) * clique
        edges.append((base, nxt))
        edges.append((nxt, base))
    snd, rcv = np.array(edges, np.int32).T
    if shuffle:
        rng = np.random.default_rng(seed)
        relabel = rng.permutation(n).astype(np.int32)
        snd, rcv = relabel[snd], relabel[rcv]
    order = np.argsort(rcv, kind="stable")
    snd, rcv = snd[order], rcv[order]
    mask = np.ones(snd.shape[0], bool)
    return snd, rcv, mask, n


def test_reorder_is_a_permutation_and_keeps_padding_last():
    snd, rcv, em, n = _ring_of_cliques()
    node_mask = np.ones(n, bool)
    node_mask[-16:] = False          # pretend the tail is padding
    em = em & (snd < n - 16) & (rcv < n - 16)
    perm = locality_reorder(snd, rcv, em, n, node_mask=node_mask)
    assert sorted(perm.tolist()) == list(range(n))
    # padding node ids occupy the final positions
    assert set(perm[-16:].tolist()) == set(range(n - 16, n))


def test_reorder_preserves_graph_structure():
    snd, rcv, em, n = _ring_of_cliques()
    perm = locality_reorder(snd, rcv, em, n)
    new_s, new_r = apply_node_reorder(perm, snd, rcv)
    old_edges = set(zip(snd.tolist(), rcv.tolist()))
    # mapping new endpoints back through perm must recover the old edges
    back = set(zip(perm[new_s].tolist(), perm[new_r].tolist()))
    assert back == old_edges


def test_reorder_shrinks_halo_width():
    D = 8
    snd, rcv, em, n = _ring_of_cliques(num_cliques=64, clique=8)
    plan_shuffled = plan_halo_exchange(snd, rcv, em, n, D)
    perm = locality_reorder(snd, rcv, em, n)
    new_s, new_r = apply_node_reorder(perm, snd, rcv)
    order = np.argsort(new_r, kind="stable")
    plan_sorted = plan_halo_exchange(new_s[order], new_r[order], em, n, D)
    h0 = plan_shuffled["halo_width"]
    h1 = plan_sorted["halo_width"]
    # shuffled ids: nearly every sender is remote (H approaches the block
    # size); CM order: only ring links + block-straddling cliques cross
    assert h1 * 2 <= h0, (h0, h1)
    # halo EDGE count (the work the overlap path must defer) also drops
    e0 = int(plan_shuffled["mask_hal"].sum())
    e1 = int(plan_sorted["mask_hal"].sum())
    assert e1 * 4 <= e0, (e0, e1)


def test_sharded_gcn_forward_invariant_under_reorder():
    D = 8
    snd, rcv, em, n = _ring_of_cliques(num_cliques=16, clique=8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 16)).astype(np.float32)

    mesh = make_mesh(("data",), (D,))
    dims = [16, 32, 8]
    params = init_sharded_gcn_params(jax.random.PRNGKey(0), dims)
    forward, _ = make_sharded_gcn(mesh, num_layers=2)

    def run(s, r, feats):
        order = np.argsort(r, kind="stable")
        plan_np = plan_halo_exchange(s[order], r[order], em, n, D)
        plan = {k: np.asarray(v) for k, v in plan_np.items()
                if k not in ("block_size", "halo_width")}
        (xb,) = shard_node_blocks(mesh, D, feats)
        return np.asarray(forward(params, xb, plan)).reshape(n, -1)

    base = run(snd, rcv, x)
    perm = locality_reorder(snd, rcv, em, n)
    new_s, new_r, x_p = apply_node_reorder(perm, snd, rcv, x)
    reordered = run(new_s, new_r, x_p)
    # un-permute and compare node-for-node
    np.testing.assert_allclose(reordered, base[perm], rtol=1e-5, atol=1e-5)
