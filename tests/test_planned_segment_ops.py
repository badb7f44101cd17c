"""segment_sum_planned / gather_planned (ops/segment.py): the planned
scatter and the gather whose BACKWARD is a planned scatter, vs XLA
references — forward, VJPs (receiver AND sender side), tile-rounded
plans, and fallback behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.ops import spmm as spmm_mod
from graph_hscn_tpu.ops.segment import (gather_planned, segment_sum,
                                        segment_sum_planned)


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

@pytest.fixture(scope="module")
def batch():
    graphs = make_peptides_func(num_graphs=8, seed=31, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=8, edge_multiple=256)
    b = pack_batch(graphs, budget, with_spmm_plan=True)
    assert b.spmm is not None
    return b


@pytest.fixture(autouse=True)
def force_pallas():
    spmm_mod.set_backend("pallas")
    yield
    spmm_mod.set_backend("auto")


def test_segment_sum_planned_fwd_bwd(batch):
    n = batch.num_nodes_padded
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.normal(size=(batch.senders.shape[0], 32))
                       .astype(np.float32))
    msgs = jnp.where(batch.edge_mask[:, None], msgs, 0.0)
    g = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))

    def f_k(m):
        return jnp.vdot(segment_sum_planned(m, batch.receivers, n,
                                            plan=batch.spmm,
                                            interpret=True), g)

    def f_r(m):
        return jnp.vdot(segment_sum(m, batch.receivers, n,
                                    indices_are_sorted=True), g)

    np.testing.assert_allclose(float(f_k(msgs)), float(f_r(msgs)),
                               rtol=1e-5)
    dk = jax.grad(f_k)(msgs)
    dr = jax.grad(f_r)(msgs)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dr),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("side,idx_name", [("receiver", "receivers"),
                                           ("sender", "senders")])
def test_gather_planned_fwd_bwd(batch, side, idx_name):
    """Forward equals x[idx]; backward (a scatter-add through the plan —
    transpose windows for the sender side) matches jnp.take's VJP given
    masked-edge cotangents."""
    n = batch.num_nodes_padded
    idx = getattr(batch, idx_name)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ge = jnp.asarray(rng.normal(size=(idx.shape[0], 32))
                     .astype(np.float32))
    # The contract: cotangents on masked edges are zero.
    ge = jnp.where(batch.edge_mask[:, None], ge, 0.0)

    out = gather_planned(x, idx, plan=batch.spmm, side=side,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(x, idx, axis=0)))

    def f_k(x):
        return jnp.vdot(gather_planned(x, idx, plan=batch.spmm, side=side,
                                       interpret=True), ge)

    def f_r(x):
        return jnp.vdot(jnp.take(x, idx, axis=0), ge)

    dk = jax.grad(f_k)(x)
    dr = jax.grad(f_r)(x)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dr),
                               rtol=1e-4, atol=1e-4)


def test_fallbacks_without_plan(batch):
    n = batch.num_nodes_padded
    rng = np.random.default_rng(2)
    msgs = jnp.asarray(rng.normal(size=(batch.senders.shape[0], 8))
                       .astype(np.float32))
    out = segment_sum_planned(msgs, batch.receivers, n, plan=None)
    ref = segment_sum(msgs, batch.receivers, n, indices_are_sorted=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    out = gather_planned(x, batch.senders, plan=None, side="sender")
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x[batch.senders]))
