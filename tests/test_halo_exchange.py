"""v2 targeted halo exchange (all_to_all) vs v1 all-gather vs single-device."""

import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.ops.segment import segment_sum
from graph_hscn_tpu.parallel.edge_partition import (make_sharded_spmm_halo,
                                                    plan_halo_exchange,
                                                    shard_arrays)
from graph_hscn_tpu.parallel.mesh import make_mesh


def test_halo_spmm_matches_reference():
    D = 8
    graphs = make_peptides_func(num_graphs=16, seed=33, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=16,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan = plan_halo_exchange(np.asarray(b.senders),
                              np.asarray(b.receivers),
                              np.asarray(b.edge_mask), n, D)
    nb, H = plan["block_size"], plan["halo_width"]
    x = np.random.default_rng(5).normal(size=(n, 64)).astype(np.float32)

    mesh = make_mesh(("data",), (D,))
    f = make_sharded_spmm_halo(mesh)
    out_blocks = f(*shard_arrays(
        mesh, x.reshape(D, nb, 64), plan["send_idx"], plan["snd_remap"],
        plan["rcv_local"], plan["mask"]))
    out = np.asarray(out_blocks).reshape(n, 64)

    msgs = np.where(np.asarray(b.edge_mask)[:, None],
                    x[np.asarray(b.senders)], 0.0)
    ref = np.asarray(segment_sum(jnp.asarray(msgs),
                                 jnp.asarray(b.receivers), n,
                                 indices_are_sorted=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # Halo width must be far below the full node count (targeted exchange).
    assert D * H < n, f"halo {D * H} not smaller than N={n}"


def test_overlap_spmm_matches_reference():
    """v3 (split local/halo, collective overlapped with local aggregation)
    must equal the dense reference and the v2 result."""
    from graph_hscn_tpu.parallel.edge_partition import \
        make_sharded_spmm_overlap

    D = 8
    graphs = make_peptides_func(num_graphs=16, seed=34, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=16,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan = plan_halo_exchange(np.asarray(b.senders),
                              np.asarray(b.receivers),
                              np.asarray(b.edge_mask), n, D)
    nb = plan["block_size"]
    x = np.random.default_rng(6).normal(size=(n, 64)).astype(np.float32)

    mesh = make_mesh(("data",), (D,))
    f = make_sharded_spmm_overlap(mesh)
    out_blocks = f(*shard_arrays(
        mesh, x.reshape(D, nb, 64), plan["send_idx"],
        plan["snd_loc"], plan["rcv_loc"], plan["mask_loc"],
        plan["snd_hal"], plan["rcv_hal"], plan["mask_hal"]))
    out = np.asarray(out_blocks).reshape(n, 64)

    msgs = np.where(np.asarray(b.edge_mask)[:, None],
                    x[np.asarray(b.senders)], 0.0)
    ref = np.asarray(segment_sum(jnp.asarray(msgs),
                                 jnp.asarray(b.receivers), n,
                                 indices_are_sorted=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # Split covers every real edge exactly once.
    assert (plan["mask_loc"].sum() + plan["mask_hal"].sum()
            == np.asarray(b.edge_mask).sum())
