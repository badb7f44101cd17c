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


def test_reorder_restores_plan_eligibility():
    """Round-4 fix: after apply_node_reorder the edge list is no longer
    receiver-sorted, which silently broke Pallas SpMM plan construction
    on every reorder=True run (plans need narrow per-tile node spans).
    sort_edges_by_receiver must restore the invariant and plans must
    attach for 1- and 8-way partitions of a giant packed batch."""
    import numpy as np

    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    from graph_hscn_tpu.data.synthetic import make_voc_superpixels
    from graph_hscn_tpu.parallel.edge_partition import (
        apply_node_reorder, local_spmm_plans, locality_reorder,
        plan_halo_exchange, sort_edges_by_receiver)

    graphs = make_voc_superpixels(num_graphs=16, seed=5)
    for D in (1, 8):
        budget = PadBudget.for_dataset(graphs, batch_size=len(graphs),
                                       node_multiple=D * 8)
        b = pack_batch(graphs, budget)
        n = b.num_nodes_padded
        snd, rcv = np.asarray(b.senders), np.asarray(b.receivers)
        em, nok = np.asarray(b.edge_mask), np.asarray(b.node_mask)
        perm = locality_reorder(snd, rcv, em, n, node_mask=nok)
        snd, rcv, nok = apply_node_reorder(perm, snd, rcv, nok)
        # Broken without the re-sort:
        assert not np.all(np.diff(rcv[em]) >= 0)
        snd2, rcv2, em2, eo = sort_edges_by_receiver(snd, rcv, em, n)
        assert np.all(np.diff(rcv2[em2]) >= 0)
        # edge_perm maps back to pre-sort positions.
        assert np.array_equal(rcv2, rcv[eo])
        plan_np = plan_halo_exchange(snd2, rcv2, em2, n, D)
        sp = local_spmm_plans(plan_np, plan_np["block_size"])
        assert sp is not None, f"plans must attach after re-sort (D={D})"


def test_gatedgcn_edge_features_survive_reorder(tmp_path):
    """CLI-level: edge-featured sharded GatedGCN with locality reorder on
    must train finitely (the stored per-edge feature indices are composed
    through the re-sort permutation)."""
    import numpy as np

    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "mp": {"conv_type": "gatedgcn", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gatedgcn", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True,
                 "locality_reorder": True},
    }
    r = run_experiment(parse_config(raw))
    assert np.isfinite(r.history[-1]["train_loss"])


def test_edge_feature_indices_compose_through_resort():
    """Direct check of the eidx composition: after reorder + receiver
    re-sort, gather_edge_groups must still pair every (src, dst) edge
    with ITS original feature row."""
    import numpy as np

    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    from graph_hscn_tpu.data.synthetic import make_peptides_func
    from graph_hscn_tpu.parallel.edge_partition import (
        apply_node_reorder, locality_reorder, plan_halo_exchange,
        sort_edges_by_receiver)
    from graph_hscn_tpu.parallel.sharded_gatedgcn import gather_edge_groups

    D = 4
    graphs = make_peptides_func(num_graphs=6, seed=11, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=6,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    snd0 = np.asarray(b.senders)
    rcv0 = np.asarray(b.receivers)
    em = np.asarray(b.edge_mask)
    ef = np.asarray(b.edge_feat)
    nok = np.asarray(b.node_mask)
    # Ground truth: original (src, dst) -> feature row (edges unique
    # after dedup in the generator).
    truth = {(int(s), int(r)): ef[i] for i, (s, r) in
             enumerate(zip(snd0, rcv0)) if em[i]}

    perm = locality_reorder(snd0, rcv0, em, n, node_mask=nok)
    snd, rcv, nok2 = apply_node_reorder(perm, snd0, rcv0, nok)
    snd, rcv, em2, eo = sort_edges_by_receiver(snd, rcv, em, n)
    plan_np = plan_halo_exchange(snd, rcv, em2, n, D)
    plan_np["eidx_loc"] = eo[plan_np["eidx_loc"]]
    plan_np["eidx_hal"] = eo[plan_np["eidx_hal"]]
    e_loc, e_hal = gather_edge_groups(ef, plan_np)
    nb = plan_np["block_size"]
    checked = 0
    for d in range(D):
        for k in range(plan_np["snd_loc"].shape[1]):
            if not plan_np["mask_loc"][d, k]:
                continue
            # Local-group endpoints are device-local row ids.
            s_new = int(plan_np["snd_loc"][d, k]) + d * nb
            r_new = int(plan_np["rcv_loc"][d, k]) + d * nb
            key = (int(perm[s_new]), int(perm[r_new]))  # back to old ids
            np.testing.assert_array_equal(e_loc[d, k], truth[key])
            checked += 1
    assert checked > 100
