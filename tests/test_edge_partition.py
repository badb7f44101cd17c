"""Edge-partitioned sharded message passing vs single-device reference on
the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.ops.segment import segment_sum
from graph_hscn_tpu.parallel.edge_partition import (
    make_sharded_mincut_contractions, make_sharded_spmm,
    partition_edges_by_receiver, shard_arrays)
from graph_hscn_tpu.parallel.mesh import make_mesh


def _batch(num_devices=8):
    graphs = make_peptides_func(num_graphs=16, seed=21, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=16,
                                   node_multiple=num_devices * 8)
    return pack_batch(graphs, budget)


def test_sharded_spmm_matches_single_device():
    D = 8
    b = _batch(D)
    n = b.num_nodes_padded
    snd, rcv_l, mask, nb, _ = partition_edges_by_receiver(
        np.asarray(b.senders), np.asarray(b.receivers),
        np.asarray(b.edge_mask), n, D)
    x = np.random.default_rng(0).normal(size=(n, 64)).astype(np.float32)

    mesh = make_mesh(("data",), (D,))
    f = make_sharded_spmm(mesh)
    x_blocks = x.reshape(D, nb, 64)
    out_blocks = f(*shard_arrays(mesh, x_blocks, snd, rcv_l, mask))
    out = np.asarray(out_blocks).reshape(n, 64)

    msgs = np.where(np.asarray(b.edge_mask)[:, None],
                    x[np.asarray(b.senders)], 0.0)
    ref = np.asarray(segment_sum(jnp.asarray(msgs),
                                 jnp.asarray(b.receivers), n,
                                 indices_are_sorted=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sharded_mincut_contractions():
    D = 8
    b = _batch(D)
    n = b.num_nodes_padded
    K, F = 4, 32
    rng = np.random.default_rng(1)
    s = rng.normal(size=(n, K)).astype(np.float32)
    x = rng.normal(size=(n, F)).astype(np.float32)
    snd, rcv_l, mask, nb, _ = partition_edges_by_receiver(
        np.asarray(b.senders), np.asarray(b.receivers),
        np.asarray(b.edge_mask), n, D)

    mesh = make_mesh(("data",), (D,))
    f = make_sharded_mincut_contractions(mesh)
    stx, stas = f(*shard_arrays(mesh, s.reshape(D, nb, K),
                                x.reshape(D, nb, F), snd, rcv_l, mask))

    # Dense reference: A[r, s] over real edges.
    a = np.zeros((n, n), np.float32)
    for e in range(b.senders.shape[0]):
        if b.edge_mask[e]:
            a[b.receivers[e], b.senders[e]] += 1.0
    np.testing.assert_allclose(np.asarray(stx), s.T @ x, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(stas), s.T @ a @ s, rtol=1e-3,
                               atol=1e-3)
