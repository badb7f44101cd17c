"""Multi-head SpMM + blocked SDDMM kernels (interpret mode on CPU) vs XLA
gather/segment references: forward, both VJPs, and the GAT logit helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.ops.pallas.multihead_kernel import (gat_edge_logits,
                                                        sddmm_mh, spmm_mh)
from graph_hscn_tpu.ops.segment import segment_sum

H, C = 4, 16


@pytest.fixture(scope="module")
def planned_batch():
    graphs = make_peptides_func(num_graphs=8, seed=21, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=8, edge_multiple=256)
    batch = pack_batch(graphs, budget, with_spmm_plan=True)
    assert batch.spmm is not None
    return batch


def pad_alpha(alpha, E):
    return np.pad(alpha, ((0, E - alpha.shape[0]), (0, 0)))


def xla_mh_ref(x, batch, alpha):
    """out[i, h-block] = sum_e alpha[e, h] x[send_e, h-block]."""
    n = x.shape[0]
    xh = x.reshape(n, H, C)
    msgs = xh[batch.senders] * alpha[:, :, None]
    msgs = jnp.where(batch.edge_mask[:, None, None], msgs, 0.0)
    out = segment_sum(msgs, batch.receivers, n, indices_are_sorted=True)
    return out.reshape(n, H * C)


def test_spmm_mh_forward(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.2, 1.0, size=(b.senders.shape[0], H))
                        .astype(np.float32))
    out = spmm_mh(x, alpha, b.spmm, heads=H, num_nodes=n, interpret=True)
    ref = xla_mh_ref(x, b, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_spmm_mh_grads(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.2, 1.0, size=(b.senders.shape[0], H))
                        .astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))

    def f_k(x, a):
        return jnp.vdot(spmm_mh(x, a, b.spmm, heads=H, num_nodes=n,
                                interpret=True), g)

    def f_r(x, a):
        return jnp.vdot(xla_mh_ref(x, b, a), g)

    dxk, dak = jax.grad(f_k, argnums=(0, 1))(x, alpha)
    dxr, dar = jax.grad(f_r, argnums=(0, 1))(x, alpha)
    np.testing.assert_allclose(np.asarray(dxk), np.asarray(dxr),
                               rtol=1e-4, atol=1e-4)
    mask = np.asarray(b.edge_mask)
    np.testing.assert_allclose(np.asarray(dak)[mask],
                               np.asarray(dar)[mask], rtol=1e-4, atol=1e-4)


def test_sddmm_mh_forward_and_grads(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(2)
    hs = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))
    hd = jnp.asarray(rng.normal(size=(n, H * C)).astype(np.float32))

    E = b.senders.shape[0]
    out = sddmm_mh(hs, hd, b.spmm, heads=H, interpret=True)[:E]
    hsb = hs.reshape(n, H, C)
    hdb = hd.reshape(n, H, C)
    ref = jnp.sum(hsb[b.senders] * hdb[b.receivers], axis=-1)
    ref = jnp.where(b.edge_mask[:, None], ref, 0.0)
    mask = np.asarray(b.edge_mask)
    np.testing.assert_allclose(np.asarray(out)[mask],
                               np.asarray(ref)[mask], rtol=1e-4, atol=1e-4)

    ge = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    ge = jnp.where(b.edge_mask[:, None], ge, 0.0)

    def f_k(hs, hd):
        out = sddmm_mh(hs, hd, b.spmm, heads=H, interpret=True)
        return jnp.vdot(out[:E], ge)

    def f_r(hs, hd):
        hsb = hs.reshape(n, H, C)
        hdb = hd.reshape(n, H, C)
        e = jnp.sum(hsb[b.senders] * hdb[b.receivers], axis=-1)
        e = jnp.where(b.edge_mask[:, None], e, 0.0)
        return jnp.vdot(e, ge)

    dsk, ddk = jax.grad(f_k, argnums=(0, 1))(hs, hd)
    dsr, ddr = jax.grad(f_r, argnums=(0, 1))(hs, hd)
    np.testing.assert_allclose(np.asarray(dsk), np.asarray(dsr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ddk), np.asarray(ddr),
                               rtol=1e-4, atol=1e-4)


def test_gat_edge_logits(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(3)
    a_src = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))

    E = b.senders.shape[0]
    e = gat_edge_logits(a_src, a_dst, b.spmm, interpret=True)[:E]
    ref = a_src[b.senders] + a_dst[b.receivers]
    mask = np.asarray(b.edge_mask)
    np.testing.assert_allclose(np.asarray(e)[mask], np.asarray(ref)[mask],
                               rtol=1e-4, atol=1e-4)

    # Grads flow back to the node-level attention coefficients.
    ge = jnp.asarray(rng.normal(size=e.shape).astype(np.float32))
    ge = jnp.where(b.edge_mask[:, None], ge, 0.0)

    def f_k(a_src, a_dst):
        e = gat_edge_logits(a_src, a_dst, b.spmm, interpret=True)
        return jnp.vdot(e[:E], ge)

    def f_r(a_src, a_dst):
        e = a_src[b.senders] + a_dst[b.receivers]
        e = jnp.where(b.edge_mask[:, None], e, 0.0)
        return jnp.vdot(e, ge)

    dsk, ddk = jax.grad(f_k, argnums=(0, 1))(a_src, a_dst)
    dsr, ddr = jax.grad(f_r, argnums=(0, 1))(a_src, a_dst)
    np.testing.assert_allclose(np.asarray(dsk), np.asarray(dsr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ddk), np.asarray(ddr),
                               rtol=1e-4, atol=1e-4)
