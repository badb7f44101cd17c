"""Sharded HSCN (edge-partitioned local nodes + replicated virtual nodes)
vs the flax HSCN model with mapped weights: forward allclose and finite
psum'd gradients on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_voc_superpixels
from graph_hscn_tpu.models.hscn import HSCN
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import shard_node_blocks
from graph_hscn_tpu.parallel.sharded_hscn import (init_sharded_hscn_params,
                                                  make_sharded_hscn)

D = 8
K = 4
HID = 16


def _setup():
    rng = np.random.default_rng(7)
    graphs = make_voc_superpixels(num_graphs=1, seed=70, mean_nodes=500)
    g = graphs[0].replace(
        cluster=rng.integers(0, K, size=graphs[0].num_nodes)
        .astype(np.int32))
    budget = PadBudget.for_dataset([g], batch_size=1, node_multiple=D * 8)
    b = pack_batch([g], budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    return b, plan, n


def _map_params(sharded_params, num_layers):
    """Sharded param pytree -> flax HSCN variables dict."""
    p = {}
    for i, layer in enumerate(sharded_params["layers"]):
        H, C = layer["lv"]["att_src"].shape
        p[f"GCNConv_{i}"] = {"kernel": layer["ll"]["kernel"],
                             "bias": layer["ll"]["bias"]}
        p[f"GATConv_{i}"] = {
            "kernel_src": layer["lv"]["kernel_src"],
            "kernel_dst": layer["lv"]["kernel_dst"],
            "att_src": layer["lv"]["att_src"].reshape(1, H, C),
            "att_dst": layer["lv"]["att_dst"].reshape(1, H, C),
            "bias": layer["lv"]["bias"]}
        p[f"DenseGCN_{i}"] = {"kernel": layer["vv"]["kernel"],
                              "bias": layer["vv"]["bias"]}
        if "vl" in layer:
            p[f"VLDense_{i}"] = {"kernel": layer["vl"]["kernel"],
                                 "bias": layer["vl"]["bias"]}
    p["Dense_0"] = {"kernel": sharded_params["head"]["h1"]["kernel"],
                    "bias": sharded_params["head"]["h1"]["bias"]}
    p["Dense_1"] = {"kernel": sharded_params["head"]["h2"]["kernel"],
                    "bias": sharded_params["head"]["h2"]["bias"]}
    return {"params": p}


@pytest.mark.parametrize("pattern,heads", [("clique", 1),
                                           ("triangular", 1),
                                           ("triangular", 2),
                                           ("clique", 4)])
def test_sharded_hscn_matches_flax(pattern, heads):
    b, plan, n = _setup()
    mesh = make_mesh(("data",), (D,))
    L = 3
    params = init_sharded_hscn_params(jax.random.PRNGKey(2),
                                      num_features=14, hidden=HID,
                                      num_classes=21, num_layers=L,
                                      heads=heads)
    forward, _ = make_sharded_hscn(mesh, K, vv_pattern=pattern,
                                   heads=heads)

    xb, mb, cb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat), np.asarray(b.node_mask),
        np.asarray(b.cluster))
    out = np.asarray(forward(params, xb, mb, cb, plan)).reshape(n, -1)

    flax_model = HSCN(lv_conv="gat", ll_conv="gcn", vv_conv="gcn",
                      activation="relu", hidden_channels=HID,
                      num_classes=21, num_layers=L, num_clusters=K,
                      vv_pattern=pattern, readout="none",
                      num_heads=heads)
    ref = np.asarray(flax_model.apply(_map_params(params, L), b,
                                      train=False))
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], ref[mask], rtol=2e-4, atol=2e-4)


def test_sharded_hscn_grads_finite_and_partition_invariant():
    b, plan, n = _setup()
    L = 2
    params = init_sharded_hscn_params(jax.random.PRNGKey(3),
                                      num_features=14, hidden=HID,
                                      num_classes=21, num_layers=L)
    node_ok = np.asarray(b.node_mask)
    losses = []
    for d in (1, D):
        mesh = make_mesh(("data",), (d,), devices=jax.devices()[:d])
        plan_np = plan_halo_exchange(np.asarray(b.senders),
                                     np.asarray(b.receivers),
                                     np.asarray(b.edge_mask), n, d)
        pl = {k: jnp.asarray(v) for k, v in plan_np.items()
              if k not in ("block_size", "halo_width")}
        _, vg = make_sharded_hscn(mesh, K)
        xb, mb, cb, yb, okb = shard_node_blocks(
            mesh, d, np.asarray(b.node_feat), np.asarray(b.node_mask),
            np.asarray(b.cluster), np.asarray(b.node_y), node_ok)
        loss, grads = vg(params, xb, mb, cb, pl, yb, okb)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_sharded_hscn_virtual_feedback_matches_flax():
    """quirk #17 extension: with hscn.virtual_feedback the v->l
    projection makes the virtual pathway live.  The sharded program
    (replicated virtual nodes -> communication-free gather by cluster)
    must equal the flax model with mapped weights, and the feedback must
    actually change the output (the pathway is no longer inert)."""
    b, plan, n = _setup()
    mesh = make_mesh(("data",), (D,))
    L = 2
    params = init_sharded_hscn_params(jax.random.PRNGKey(5),
                                      num_features=14, hidden=HID,
                                      num_classes=21, num_layers=L,
                                      virtual_feedback=True)
    # vl is ZERO-init (the feedback starts as the base model); fill it
    # with random values to exercise the trained-state program path.
    rng = np.random.default_rng(11)
    for layer in params["layers"]:
        layer["vl"]["kernel"] = jnp.asarray(
            rng.normal(size=layer["vl"]["kernel"].shape)
            .astype(np.float32) * 0.3)
        layer["vl"]["bias"] = jnp.asarray(
            rng.normal(size=layer["vl"]["bias"].shape)
            .astype(np.float32) * 0.1)
    forward, _ = make_sharded_hscn(mesh, K)

    xb, mb, cb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat), np.asarray(b.node_mask),
        np.asarray(b.cluster))
    out = np.asarray(forward(params, xb, mb, cb, plan)).reshape(n, -1)

    flax_model = HSCN(lv_conv="gat", ll_conv="gcn", vv_conv="gcn",
                      activation="relu", hidden_channels=HID,
                      num_classes=21, num_layers=L, num_clusters=K,
                      vv_pattern="triangular", readout="none",
                      virtual_feedback=True)
    ref = np.asarray(flax_model.apply(_map_params(params, L), b,
                                      train=False))
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], ref[mask], rtol=2e-4, atol=2e-4)

    # Inertness is broken by the feedback: dropping the vl params from
    # the same pytree (no-feedback program) changes the output.
    params_nofb = {
        "layers": [{k: v for k, v in layer.items() if k != "vl"}
                   for layer in params["layers"]],
        "head": params["head"]}
    out_nofb = np.asarray(forward(params_nofb, xb, mb, cb,
                                  plan)).reshape(n, -1)
    assert not np.allclose(out[mask], out_nofb[mask])
