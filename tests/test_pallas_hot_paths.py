"""Pallas kernels deployed in the hot paths (VERDICT round-1 item 2):

- GATConv attention aggregation through spmm_pallas when a batch plan is
  attached and the pallas backend is selected (d(alpha) flows through the
  SDDMM kernel in the custom VJP) — must match the XLA segment path.
- Sharded GCN/GAT local-sender aggregation through per-device Pallas
  plans (edge_partition.local_spmm_plans) — must match the plain
  segment-sum shard_map program.

All on CPU in interpret mode (resolve_interpret auto).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func, \
    make_voc_superpixels
from graph_hscn_tpu.models.layers import GATConv
from graph_hscn_tpu.ops import spmm as spmm_mod
from graph_hscn_tpu.parallel.edge_partition import (local_spmm_plans,
                                                    plan_halo_exchange)
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import (init_sharded_gat_params,
                                                 init_sharded_gcn_params,
                                                 make_sharded_gat,
                                                 make_sharded_gcn,
                                                 shard_node_blocks)


@pytest.fixture
def pallas_backend():
    spmm_mod.set_backend("pallas")
    try:
        yield
    finally:
        spmm_mod.set_backend("auto")


def _gat_batch():
    graphs = make_peptides_func(num_graphs=6, seed=3, mean_nodes=40)
    budget = PadBudget.for_dataset(graphs, batch_size=6)
    return pack_batch(graphs, budget, with_spmm_plan=True)


@pytest.mark.parametrize("heads,self_loops", [(1, True), (2, False)])
def test_gat_plan_path_matches_xla(pallas_backend, heads, self_loops):
    b = _gat_batch()
    assert b.spmm is not None
    n = b.num_nodes_padded
    layer = GATConv(features=8, heads=heads, add_self_loops=self_loops)
    params = layer.init(jax.random.PRNGKey(0), b.node_feat, b.senders,
                        b.receivers, b.edge_mask, num_nodes=n)

    def run(plan):
        def loss(p):
            out = layer.apply(p, b.node_feat, b.senders, b.receivers,
                              b.edge_mask, num_nodes=n, plan=plan)
            return jnp.sum(out ** 2), out
        (val, out), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, out, grads

    v_pl, out_pl, g_pl = run(b.spmm)
    spmm_mod.set_backend("xla")
    v_xla, out_xla, g_xla = run(b.spmm)

    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(np.asarray(out_pl)[mask],
                               np.asarray(out_xla)[mask],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(v_pl), float(v_xla), rtol=2e-4)
    for a, c in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-4)


def _sharded_setup(D=8):
    graphs = make_voc_superpixels(num_graphs=4, seed=17, mean_nodes=200)
    budget = PadBudget.for_dataset(graphs, batch_size=4,
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    sp = local_spmm_plans(plan_np, plan_np["block_size"])
    assert sp is not None, "test graphs must admit per-device plans"
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    plan_sp = dict(plan, spmm_loc=sp)
    return b, plan, plan_sp, n


@pytest.mark.parametrize("family", ["gcn", "gat"])
def test_sharded_local_agg_pallas_matches_segment_sum(family):
    D = 8
    b, plan, plan_sp, n = _sharded_setup(D)
    mesh = make_mesh(("data",), (D,))
    # hidden >= 64: below that the width gate routes the plan path
    # to XLA per call and the comparison would be vacuous.
    dims = [14, 64, 21]
    if family == "gcn":
        params = init_sharded_gcn_params(jax.random.PRNGKey(0), dims)
        fwd_ref, vg_ref = make_sharded_gcn(mesh, num_layers=2)
        fwd_pl, vg_pl = make_sharded_gcn(mesh, num_layers=2,
                                         use_spmm_plan=True)
    else:
        params = init_sharded_gat_params(jax.random.PRNGKey(0), dims)
        fwd_ref, vg_ref = make_sharded_gat(mesh, num_layers=2)
        fwd_pl, vg_pl = make_sharded_gat(mesh, num_layers=2,
                                         use_spmm_plan=True)

    node_ok = np.asarray(b.node_mask) & (np.asarray(b.node_y).sum(1) > 0)
    xb, yb, okb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat), np.asarray(b.node_y), node_ok)

    out_ref = np.asarray(fwd_ref(params, xb, plan)).reshape(n, -1)
    out_pl = np.asarray(fwd_pl(params, xb, plan_sp)).reshape(n, -1)
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out_pl[mask], out_ref[mask],
                               rtol=2e-4, atol=2e-4)

    l_ref, g_ref = vg_ref(params, xb, plan, yb, okb)
    l_pl, g_pl = vg_pl(params, xb, plan_sp, yb, okb)
    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-4)


def test_sharded_gcn_bf16_composes_with_plan():
    """bf16 mixed precision + Pallas plan path on the sharded GCN: runs,
    returns f32 logits, and tracks the f32 plan path loosely (bf16
    operands, f32 MXU accumulation)."""
    D = 8
    b, plan, plan_sp, n = _sharded_setup(D)
    mesh = make_mesh(("data",), (D,))
    dims = [14, 64, 21]
    params = init_sharded_gcn_params(jax.random.PRNGKey(0), dims)
    fwd_f32, vg_f32 = make_sharded_gcn(mesh, num_layers=2,
                                       use_spmm_plan=True)
    fwd_bf16, vg_bf16 = make_sharded_gcn(mesh, num_layers=2,
                                         use_spmm_plan=True,
                                         dtype=jnp.bfloat16)

    node_ok = np.asarray(b.node_mask) & (np.asarray(b.node_y).sum(1) > 0)
    xb, yb, okb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat), np.asarray(b.node_y), node_ok)

    out32 = np.asarray(fwd_f32(params, xb, plan_sp)).reshape(n, -1)
    out16 = np.asarray(fwd_bf16(params, xb, plan_sp)).reshape(n, -1)
    assert out16.dtype == np.float32
    mask = np.asarray(b.node_mask)
    scale = np.abs(out32[mask]).max() + 1e-6
    assert np.abs(out16[mask] - out32[mask]).max() / scale < 0.1

    l16, g16 = vg_bf16(params, xb, plan_sp, yb, okb)
    assert np.isfinite(float(l16))
    for g in jax.tree_util.tree_leaves(g16):
        assert np.asarray(g).dtype == np.float32
        assert np.isfinite(np.asarray(g)).all()


def test_gatedgcn_planned_scatter_matches_xla(pallas_backend):
    """GatedGCN's two [E, F] scatters ride segment_reduce_pallas when a
    plan is attached: values and grads match the XLA path."""
    from graph_hscn_tpu.models.layers import GatedGCNConv

    b = _gat_batch()
    assert b.spmm is not None
    n = b.num_nodes_padded
    E = b.senders.shape[0]
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(E, 16)).astype(np.float32))
    layer = GatedGCNConv(features=16)
    params = layer.init(jax.random.PRNGKey(0), x, e, b.senders,
                        b.receivers, b.edge_mask, num_nodes=n)

    def run(plan):
        def loss(p):
            xo, eo = layer.apply(p, x, e, b.senders, b.receivers,
                                 b.edge_mask, num_nodes=n, plan=plan)
            return jnp.sum(xo ** 2) + jnp.sum(eo ** 2), (xo, eo)
        (val, outs), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, outs, grads

    v_pl, (xo_pl, _), g_pl = run(b.spmm)
    spmm_mod.set_backend("xla")
    v_xla, (xo_xla, _), g_xla = run(b.spmm)
    np.testing.assert_allclose(np.asarray(xo_pl), np.asarray(xo_xla),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(v_pl), float(v_xla), rtol=2e-4)
    for a, c in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-4)


def test_sharded_gatedgcn_planned_matches_unplanned(pallas_backend):
    """Edge-partitioned GatedGCN with per-device planned scatters equals
    the XLA-scatter build (values and psum'd grads, 8-device mesh)."""
    from graph_hscn_tpu.parallel.sharded_gatedgcn import (
        init_sharded_gatedgcn_params, make_sharded_gatedgcn)

    b, plan, plan_sp, n = _sharded_setup()
    D = 8
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_gatedgcn_params(jax.random.PRNGKey(4), 14, None,
                                          64, 21, 2)
    xb, yb, okb = shard_node_blocks(mesh, D, np.asarray(b.node_feat),
                                    np.asarray(b.node_y),
                                    np.asarray(b.node_mask))

    fw_p, vg_p = make_sharded_gatedgcn(mesh, 2, use_spmm_plan=True)
    fw_x, vg_x = make_sharded_gatedgcn(mesh, 2, use_spmm_plan=False)
    out_p = np.asarray(fw_p(params, xb, None, None, okb, plan_sp))
    l_p, g_p = vg_p(params, xb, None, None, okb, plan_sp, yb)
    spmm_mod.set_backend("xla")
    out_x = np.asarray(fw_x(params, xb, None, None, okb, plan))
    l_x, g_x = vg_x(params, xb, None, None, okb, plan, yb)

    np.testing.assert_allclose(out_p, out_x, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-4)
    for a, c in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-4)


def test_sharded_scn_plan_path_matches_xla(pallas_backend):
    """SCN MinCUT on the Pallas local aggregation (GraphConv stack + the
    A*S contraction) vs the XLA segment-sum path: losses, grads, argmax
    assignments (VERDICT round-3 item 2)."""
    from graph_hscn_tpu.parallel.sharded_scn import (init_sharded_scn_params,
                                                     make_sharded_scn)
    D, K = 8, 4
    b, plan, plan_sp, n = _sharded_setup(D)
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_scn_params(jax.random.PRNGKey(7), 14, [64, 64],
                                     K)
    snd = np.asarray(b.senders)
    em = np.asarray(b.edge_mask)
    outdeg = np.bincount(snd[em], minlength=n).astype(np.float32)
    xb, okb, db = shard_node_blocks(mesh, D, np.asarray(b.node_feat),
                                    np.asarray(b.node_mask), outdeg)

    losses_p, vg_p, assign_p = make_sharded_scn(mesh, K,
                                                use_spmm_plan=True)
    losses_x, vg_x, assign_x = make_sharded_scn(mesh, K,
                                                use_spmm_plan=False)
    mc_p, o_p = losses_p(params, xb, okb, db, plan_sp)
    l_p, g_p = vg_p(params, xb, okb, db, plan_sp)
    a_p = np.asarray(assign_p(params, xb, okb, db, plan_sp))
    spmm_mod.set_backend("xla")
    mc_x, o_x = losses_x(params, xb, okb, db, plan)
    l_x, g_x = vg_x(params, xb, okb, db, plan)
    a_x = np.asarray(assign_x(params, xb, okb, db, plan))

    np.testing.assert_allclose(float(mc_p), float(mc_x), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(o_p), float(o_x), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-4,
                               atol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-4)
    mask = np.asarray(b.node_mask).reshape(D, -1)
    assert (a_p == a_x)[mask].mean() > 0.999


@pytest.mark.parametrize("heads", [1, 2])
def test_sharded_hscn_plan_path_matches_xla(pallas_backend, heads):
    """HSCN ll relation on the Pallas local aggregation vs XLA — the
    flagship giant-graph hetero conv (VERDICT round-3 item 2), at 1 and
    2 lv-attention heads."""
    from graph_hscn_tpu.parallel.sharded_hscn import (
        init_sharded_hscn_params, make_sharded_hscn)
    D, K = 8, 4
    b, plan, plan_sp, n = _sharded_setup(D)
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_hscn_params(jax.random.PRNGKey(3), 14, 64, 21, 2,
                                      heads=heads)
    rng = np.random.default_rng(0)
    clust = rng.integers(0, K, size=n).astype(np.int32)
    node_ok = np.asarray(b.node_mask)
    xb, yb, okb, cb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat), np.asarray(b.node_y), node_ok,
        clust)

    fw_p, vg_p = make_sharded_hscn(mesh, K, heads=heads,
                                   use_spmm_plan=True)
    fw_x, vg_x = make_sharded_hscn(mesh, K, heads=heads,
                                   use_spmm_plan=False)
    out_p = np.asarray(fw_p(params, xb, okb, cb, plan_sp)).reshape(n, -1)
    l_p, g_p = vg_p(params, xb, okb, cb, plan_sp, yb, okb)
    spmm_mod.set_backend("xla")
    out_x = np.asarray(fw_x(params, xb, okb, cb, plan)).reshape(n, -1)
    l_x, g_x = vg_x(params, xb, okb, cb, plan, yb, okb)

    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out_p[mask], out_x[mask], rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-4)
    for a, c in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-4)
