"""Pallas fused SpMM kernel correctness (interpret mode on CPU) vs the XLA
gather+segment-sum reference, forward and backward, weighted and masked."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.ops.pallas.spmm_kernel import spmm_pallas, spmm_plan
from graph_hscn_tpu.ops.segment import segment_sum


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

@pytest.fixture(scope="module")
def planned_batch():
    graphs = make_peptides_func(num_graphs=8, seed=11, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=8, edge_multiple=256)
    batch = pack_batch(graphs, budget, with_spmm_plan=True)
    assert batch.spmm is not None
    return batch


def xla_ref(x, batch, w=None):
    msgs = jnp.take(x, batch.senders, axis=0)
    if w is not None:
        msgs = msgs * w[:, None]
    msgs = jnp.where(batch.edge_mask[:, None], msgs, 0.0)
    return segment_sum(msgs, batch.receivers, x.shape[0],
                       indices_are_sorted=True)


def test_forward_matches_xla(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 128))
                    .astype(np.float32))
    out = spmm_pallas(x, b.spmm, num_nodes=n, interpret=True)
    ref = xla_ref(x, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_weighted(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 1.5,
                                size=b.senders.shape).astype(np.float32))
    out = spmm_pallas(x, b.spmm, edge_weight=w, num_nodes=n, interpret=True)
    ref = xla_ref(x, b, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_xla(planned_batch):
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    def f_pallas(x):
        return jnp.vdot(spmm_pallas(x, b.spmm, num_nodes=n,
                                    interpret=True), g)

    def f_ref(x):
        return jnp.vdot(xla_ref(x, b), g)

    dx_pallas = jax.grad(f_pallas)(x)
    dx_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(dx_pallas), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)


def test_plan_infeasible_for_giant_graph():
    """A single graph larger than the window must be rejected (fallback)."""
    rng = np.random.default_rng(3)
    n = 3000
    src = rng.integers(0, n, size=4096)
    dst = rng.integers(0, n, size=4096)
    order = np.argsort(dst)
    plan = spmm_plan(src[order].astype(np.int32),
                     dst[order].astype(np.int32),
                     np.ones(4096, bool), n)
    assert plan is None


def test_plan_rejects_window_boundary_span():
    """A real edge whose rel offset lands exactly on WINDOW (after the
    32-align-down of the window start) must make the plan infeasible, not
    silently collide with the masked-slot sentinel and drop the edge.

    Repro: one tile whose receivers span [33, 1056] — min receiver 33
    aligns down to wr=32, so receiver 1056 has rel == 1024 == WINDOW."""
    from graph_hscn_tpu.ops.pallas.spmm_kernel import WINDOW

    te = 256
    n = 2048
    dst = np.linspace(33, 32 + WINDOW, te).astype(np.int32)  # spans 1024+1
    dst.sort()
    assert dst[-1] - (dst[0] // 32) * 32 == WINDOW
    src = np.zeros(te, np.int32)
    plan = spmm_plan(src, dst, np.ones(te, bool), n, tile_edges=te)
    assert plan is None

    # One node narrower fits exactly and must produce a correct result.
    dst_ok = np.clip(dst, None, 32 + WINDOW - 1).astype(np.int32)
    plan = spmm_plan(src, dst_ok, np.ones(te, bool), n, tile_edges=te)
    assert plan is not None
    x = jnp.asarray(np.random.default_rng(7).normal(size=(n, 8))
                    .astype(np.float32))
    out = spmm_pallas(x, plan, num_nodes=n, interpret=True)
    ref = segment_sum(jnp.take(x, jnp.asarray(src), axis=0),
                      jnp.asarray(dst_ok), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_scatter_uses_plan(planned_batch, monkeypatch):
    """gather_scatter(plan=...) dispatches to the kernel when forced."""
    from graph_hscn_tpu.ops import spmm as spmm_mod
    b = planned_batch
    n = b.num_nodes_padded
    x = jnp.asarray(np.random.default_rng(4).normal(size=(n, 128))
                    .astype(np.float32))
    called = {}
    import graph_hscn_tpu.ops.pallas.spmm_kernel as kmod
    orig = kmod.spmm_pallas

    def spy(*a, **k):
        called["yes"] = True
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(kmod, "spmm_pallas", spy)
    spmm_mod.set_backend("pallas")
    try:
        out = spmm_mod.gather_scatter(x, b.senders, b.receivers,
                                      num_nodes=n, plan=b.spmm)
    finally:
        spmm_mod.set_backend("auto")
    assert called.get("yes")
    ref = xla_ref(x, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hbm_streamed_forward_matches_xla(planned_batch):
    """Large-graph variant: double-buffered HBM window DMA."""
    from graph_hscn_tpu.ops.pallas.spmm_kernel import spmm_pallas_hbm
    b = planned_batch
    n = b.num_nodes_padded
    x = jnp.asarray(np.random.default_rng(9).normal(size=(n, 128))
                    .astype(np.float32))
    out = spmm_pallas_hbm(x, b.spmm, num_nodes=n, interpret=True)
    ref = xla_ref(x, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hbm_streamed_backward_matches_xla_oversize():
    """HBM variant fwd + dx + dw on a >VMEM-budget workload
    (x = 14336 nodes x 128 f32 = 7 MB > VMEM_X_BUDGET = 6 MB), the regime
    gather_scatter routes to spmm_pallas_hbm (VERDICT round-1 item 3)."""
    from graph_hscn_tpu.ops.pallas.spmm_kernel import (VMEM_X_BUDGET,
                                                       spmm_pallas_hbm)
    graphs = make_peptides_func(num_graphs=24, seed=5, mean_nodes=580)
    budget = PadBudget.for_dataset(graphs, batch_size=24,
                                   edge_multiple=256)
    b = pack_batch(graphs, budget, with_spmm_plan=True)
    assert b.spmm is not None
    n = b.num_nodes_padded
    F = 128
    assert n * F * 4 > VMEM_X_BUDGET, f"workload too small: {n}"
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    w0 = jnp.asarray(rng.uniform(0.5, 1.5,
                                 size=b.senders.shape).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))

    out = spmm_pallas_hbm(x0, b.spmm, edge_weight=w0, num_nodes=n,
                          interpret=True)
    ref = xla_ref(x0, b, w0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def f_hbm(x, w):
        return jnp.vdot(spmm_pallas_hbm(x, b.spmm, edge_weight=w,
                                        num_nodes=n, interpret=True), g)

    def f_ref(x, w):
        return jnp.vdot(xla_ref(x, b, w), g)

    dx_h, dw_h = jax.grad(f_hbm, argnums=(0, 1))(x0, w0)
    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x0, w0)
    np.testing.assert_allclose(np.asarray(dx_h), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-4)
    mask = np.asarray(b.edge_mask)
    np.testing.assert_allclose(np.asarray(dw_h)[mask],
                               np.asarray(dw_r)[mask],
                               rtol=1e-4, atol=1e-4)


def test_gather_scatter_routes_oversize_to_hbm(monkeypatch):
    """gather_scatter picks spmm_pallas_hbm when x exceeds VMEM_X_BUDGET
    (and falls back to XLA beyond 2x)."""
    from graph_hscn_tpu.ops import spmm as spmm_mod
    import graph_hscn_tpu.ops.pallas.spmm_kernel as kmod
    graphs = make_peptides_func(num_graphs=24, seed=7, mean_nodes=580)
    budget = PadBudget.for_dataset(graphs, batch_size=24,
                                   edge_multiple=256)
    b = pack_batch(graphs, budget, with_spmm_plan=True)
    n = b.num_nodes_padded
    x = jnp.asarray(np.random.default_rng(8).normal(size=(n, 128))
                    .astype(np.float32))
    called = {}
    orig = kmod.spmm_pallas_hbm

    def spy(*a, **k):
        called["hbm"] = True
        return orig(*a, **k)

    monkeypatch.setattr(kmod, "spmm_pallas_hbm", spy)
    spmm_mod.set_backend("pallas")
    try:
        out = spmm_mod.gather_scatter(x, b.senders, b.receivers,
                                      num_nodes=n, plan=b.spmm)
    finally:
        spmm_mod.set_backend("auto")
    assert called.get("hbm")
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla_ref(x, b)),
                               rtol=1e-4, atol=1e-4)


def test_weight_gradients_match_xla(planned_batch):
    """d/d(edge_weight) through the Pallas path (SDDMM-powered)."""
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    w0 = jnp.asarray(rng.uniform(0.5, 1.5,
                                 size=b.senders.shape).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    def f_pallas(w):
        return jnp.vdot(spmm_pallas(x, b.spmm, edge_weight=w, num_nodes=n,
                                    interpret=True), g)

    def f_ref(w):
        return jnp.vdot(xla_ref(x, b, w), g)

    dw_pallas = np.asarray(jax.grad(f_pallas)(w0))
    dw_ref = np.asarray(jax.grad(f_ref)(w0))
    mask = np.asarray(b.edge_mask)
    np.testing.assert_allclose(dw_pallas[mask], dw_ref[mask], rtol=1e-4,
                               atol=1e-4)


def test_weight_grad_skip(planned_batch):
    """weight_grad=False skips the SDDMM dw (returns zeros) but keeps dx
    exact — the fast path for structural (gcn_norm) weights."""
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    w0 = jnp.asarray(rng.uniform(0.5, 1.5,
                                 size=b.senders.shape).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))

    def f(x, w):
        return jnp.vdot(spmm_pallas(x, b.spmm, edge_weight=w, num_nodes=n,
                                    interpret=True, weight_grad=False), g)

    dx, dw = jax.grad(f, argnums=(0, 1))(x, w0)

    def f_ref(x):
        return jnp.vdot(xla_ref(x, b, w0), g)

    dx_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    assert not np.asarray(dw).any()


def test_hbm_streamed_bf16_grads_match_xla():
    """bf16 operands through the HBM-streamed kernel (VERDICT r2 item 5:
    the guard lift needs a grad-allclose check in interpret mode) —
    scratch follows x.dtype, accumulation stays f32, dx/dw cotangents
    rejoin bf16 and track the XLA reference at bf16 tolerances."""
    from graph_hscn_tpu.ops.pallas.spmm_kernel import spmm_pallas_hbm

    graphs = make_peptides_func(num_graphs=8, seed=15, mean_nodes=60)
    budget = PadBudget.for_dataset(graphs, batch_size=8, edge_multiple=256)
    b = pack_batch(graphs, budget, with_spmm_plan=True)
    assert b.spmm is not None
    n = b.num_nodes_padded
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.uniform(0.5, 1.5, size=b.senders.shape)
                    .astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))

    out = spmm_pallas_hbm(x, b.spmm, edge_weight=w, num_nodes=n,
                          interpret=True)
    ref = xla_ref(x.astype(jnp.float32), b, w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    def f_k(x, w):
        y = spmm_pallas_hbm(x, b.spmm, edge_weight=w, num_nodes=n,
                            interpret=True)
        return jnp.vdot(y.astype(jnp.float32), g)

    def f_r(x, w):
        y = xla_ref(x.astype(jnp.float32), b, w.astype(jnp.float32))
        return jnp.vdot(y, g)

    dxk, dwk = jax.grad(f_k, argnums=(0, 1))(x, w)
    dxr, dwr = jax.grad(f_r, argnums=(0, 1))(x, w)
    assert dxk.dtype == jnp.bfloat16 and dwk.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(dxk, np.float32),
                               np.asarray(dxr, np.float32),
                               rtol=5e-2, atol=5e-2)
    mask = np.asarray(b.edge_mask)
    np.testing.assert_allclose(np.asarray(dwk, np.float32)[mask],
                               np.asarray(dwr, np.float32)[mask],
                               rtol=5e-2, atol=2e-1)


def test_hbm_out_streamed_matches_xla(planned_batch):
    """Fully-streamed variant (x AND out in HBM, windowed RMW): fwd + dx
    + dw vs XLA on the planned batch (interpret mode)."""
    from graph_hscn_tpu.ops.pallas.spmm_kernel import spmm_pallas_hbm
    b = planned_batch
    n = b.num_nodes_padded
    rng = np.random.default_rng(12)
    x0 = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    w0 = jnp.asarray(rng.uniform(0.5, 1.5,
                                 size=b.senders.shape).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    out = spmm_pallas_hbm(x0, b.spmm, edge_weight=w0, num_nodes=n,
                          interpret=True, stream_out=True)
    ref = xla_ref(x0, b, w0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def f_stream(x, w):
        return jnp.vdot(spmm_pallas_hbm(x, b.spmm, edge_weight=w,
                                        num_nodes=n, interpret=True,
                                        stream_out=True), g)

    def f_ref(x, w):
        return jnp.vdot(xla_ref(x, b, w), g)

    dx_s, dw_s = jax.grad(f_stream, argnums=(0, 1))(x0, w0)
    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x0, w0)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-4)
    mask = np.asarray(b.edge_mask)
    np.testing.assert_allclose(np.asarray(dw_s)[mask],
                               np.asarray(dw_r)[mask],
                               rtol=1e-4, atol=1e-4)


def test_gather_scatter_routes_giant_to_out_streamed(monkeypatch):
    """Beyond 2x VMEM budget gather_scatter now rides the out-streamed
    kernel instead of falling back to XLA (round-4 verdict item 6)."""
    from graph_hscn_tpu.ops import spmm as spmm_mod
    from graph_hscn_tpu.ops.pallas import spmm_kernel as kmod
    # Shrink the budget so a modest batch lands in the >2x band (but
    # keep it above the 3*window*F scratch guard).
    monkeypatch.setattr(kmod, "VMEM_X_BUDGET", 1024 * 1024)
    graphs = make_peptides_func(num_graphs=24, seed=13, mean_nodes=580)
    budget = PadBudget.for_dataset(graphs, batch_size=24,
                                   edge_multiple=256)
    b = pack_batch(graphs, budget, with_spmm_plan=True)
    n = b.num_nodes_padded
    assert n * 128 * 4 > 2 * kmod.VMEM_X_BUDGET
    x = jnp.asarray(np.random.default_rng(14).normal(size=(n, 128))
                    .astype(np.float32))
    called = {}
    orig = kmod.spmm_pallas_hbm

    def spy(*a, **k):
        called["stream_out"] = k.get("stream_out", False)
        return orig(*a, **k)

    monkeypatch.setattr(kmod, "spmm_pallas_hbm", spy)
    spmm_mod.set_backend("pallas")
    try:
        out = spmm_mod.gather_scatter(x, b.senders, b.receivers,
                                      num_nodes=n, plan=b.spmm)
    finally:
        spmm_mod.set_backend("auto")
    assert called.get("stream_out") is True
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla_ref(x, b)),
                               rtol=1e-4, atol=1e-4)


def test_resolve_precision_follows_config():
    """The kernels' matmul precision must follow
    jax_default_matmul_precision at trace time (runtime.matmul_precision
    pins it in parity configs — round-5 fix: the fused stack silently ran
    bf16 MXU passes under a highest-pinned config, shifting the 24x24
    GCN parity study's framework mean)."""
    from graph_hscn_tpu.ops.pallas import spmm_kernel as sk
    prev = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
        assert sk.resolve_precision() == jax.lax.Precision.HIGHEST
        jax.config.update("jax_default_matmul_precision", "default")
        assert sk.resolve_precision() == jax.lax.Precision.DEFAULT
        # Explicit override wins.
        sk.set_precision(jax.lax.Precision.HIGHEST)
        assert sk.resolve_precision() == jax.lax.Precision.HIGHEST
    finally:
        sk.set_precision(None)
        jax.config.update("jax_default_matmul_precision", prev)
