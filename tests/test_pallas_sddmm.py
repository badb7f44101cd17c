"""SDDMM + segment-reduce Pallas kernels vs XLA references (interpret
mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.ops.pallas.sddmm_kernel import (sddmm_pallas,
                                                    segment_reduce_pallas)
from graph_hscn_tpu.ops.segment import segment_sum


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

@pytest.fixture(scope="module")
def planned_batch():
    graphs = make_peptides_func(num_graphs=8, seed=71, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=8, edge_multiple=256)
    return pack_batch(graphs, budget, with_spmm_plan=True)


def test_sddmm_matches_reference(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    hd = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    out = sddmm_pallas(hs, hd, b.spmm, interpret=True)
    E = b.senders.shape[0]
    ref = np.einsum("ef,ef->e",
                    np.asarray(hs)[np.asarray(b.senders)],
                    np.asarray(hd)[np.asarray(b.receivers)])
    ref = np.where(np.asarray(b.edge_mask), ref, 0.0)
    np.testing.assert_allclose(np.asarray(out)[:E], ref, rtol=1e-4,
                               atol=1e-4)


def test_segment_reduce_matches_reference(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    E = b.senders.shape[0]
    rng = np.random.default_rng(1)
    msgs = rng.normal(size=(E, 128)).astype(np.float32)
    msgs[~np.asarray(b.edge_mask)] = 0.0
    out = segment_reduce_pallas(jnp.asarray(msgs), b.spmm, n,
                                interpret=True)
    ref = segment_sum(jnp.asarray(msgs), jnp.asarray(b.receivers), n,
                      indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
