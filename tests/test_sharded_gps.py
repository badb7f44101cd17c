"""Ring-attention sharded GPS vs the flax GPSModel with mapped weights on
the 8-device CPU mesh: forward parity (the online-softmax ring equals the
per-graph slot attention exactly), gradient finiteness + partition
invariance, and the CLI route."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_voc_superpixels
from graph_hscn_tpu.models.gps import GPSModel
from graph_hscn_tpu.parallel.edge_partition import plan_halo_exchange
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.parallel.sharded_gcn import shard_node_blocks
from graph_hscn_tpu.parallel.sharded_gps import (init_sharded_gps_params,
                                                 make_sharded_gps)

D = 8
HID = 16
HEADS = 4
L = 2


def _setup():
    """Slotted pack (so the flax GPS can run on the identical batch):
    8 graphs x slot rows, total divisible by the 8-device mesh."""
    graphs = make_voc_superpixels(num_graphs=8, seed=11, mean_nodes=40)
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    budget = PadBudget.for_dataset(graphs, batch_size=8)
    b = pack_batch(graphs, budget, slot_nodes=slot)
    n = b.num_nodes_padded
    assert n % D == 0
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    return b, plan, n


def _map_params(p, num_layers):
    """Sharded param pytree -> flax GPSModel variables."""
    out = {"Dense_0": {"kernel": p["in"]["kernel"],
                       "bias": p["in"]["bias"]}}
    for i, layer in enumerate(p["layers"]):
        out[f"GPSLayer_{i}"] = {
            "LayerNorm_0": layer["ln1"],
            "GCNConv_0": {"kernel": layer["local"]["kernel"],
                          "bias": layer["local"]["bias"]},
            "LayerNorm_1": layer["ln2"],
            "GraphMHA_0": {
                "query": {"kernel": layer["attn"]["wq"],
                          "bias": layer["attn"]["bq"]},
                "key": {"kernel": layer["attn"]["wk"],
                        "bias": layer["attn"]["bk"]},
                "value": {"kernel": layer["attn"]["wv"],
                          "bias": layer["attn"]["bv"]},
                "out": {"kernel": layer["attn"]["wo"],
                        "bias": layer["attn"]["bo"]},
            },
            "LayerNorm_2": layer["ln3"],
            "Dense_0": layer["ffn1"],
            "Dense_1": layer["ffn2"],
        }
    out["LayerNorm_0"] = p["ln_f"]
    out["Dense_1"] = p["head"]
    return {"params": out}


def test_sharded_gps_matches_flax():
    b, plan, n = _setup()
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_gps_params(jax.random.PRNGKey(3), 14, HID, 21, L,
                                     HEADS)
    forward, _ = make_sharded_gps(mesh, L, HEADS)
    xb, gb, okb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat),
        np.asarray(b.node_graph).astype(np.int32),
        np.asarray(b.node_mask))
    out = np.asarray(forward(params, xb, gb, okb, plan)).reshape(n, -1)

    flax_model = GPSModel(num_features=14, hidden_channels=HID,
                          num_classes=21, num_layers=L, num_heads=HEADS,
                          dropout=0.0, readout="none")
    ref = np.asarray(flax_model.apply(_map_params(params, L), b,
                                      train=False))
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], ref[mask], rtol=2e-4, atol=2e-4)


def test_sharded_gps_grads_match_flax():
    """AD through the ring (ppermute + scan online-softmax) vs jax.grad
    of the flax GPS loss under mapped weights."""
    b, plan, n = _setup()
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_gps_params(jax.random.PRNGKey(9), 14, HID, 21, L,
                                     HEADS)
    _, vg = make_sharded_gps(mesh, L, HEADS)
    xb, gb, okb, yb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat),
        np.asarray(b.node_graph).astype(np.int32),
        np.asarray(b.node_mask), np.asarray(b.node_y))
    loss, grads = vg(params, xb, gb, okb, plan, yb)

    flax_model = GPSModel(num_features=14, hidden_channels=HID,
                          num_classes=21, num_layers=L, num_heads=HEADS,
                          dropout=0.0, readout="none")
    ok = jnp.asarray(b.node_mask)
    y = jnp.asarray(b.node_y)
    gcnt = float(np.asarray(b.node_mask).sum())

    def flax_loss(p):
        logits = flax_model.apply({"params": p}, b, train=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.sum(y * logp, axis=-1)
        return jnp.sum(per * ok.astype(logits.dtype)) / gcnt

    mapped = _map_params(params, L)["params"]
    ref_loss = float(flax_loss(mapped))
    ref_grads = jax.grad(flax_loss)(mapped)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)

    # Spot-check the gradient leaves that exercise the ring transpose.
    att = grads["layers"][0]["attn"]
    ref_att = ref_grads["GPSLayer_0"]["GraphMHA_0"]
    for mine, theirs in ((att["wq"], ref_att["query"]["kernel"]),
                         (att["wk"], ref_att["key"]["kernel"]),
                         (att["wv"], ref_att["value"]["kernel"]),
                         (att["wo"], ref_att["out"]["kernel"])):
        np.testing.assert_allclose(np.asarray(mine), np.asarray(theirs),
                                   rtol=5e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads["in"]["kernel"]),
        np.asarray(ref_grads["Dense_0"]["kernel"]), rtol=5e-3, atol=1e-6)


def test_sharded_gps_grads_finite_and_partition_invariant():
    b, _, n = _setup()
    params = init_sharded_gps_params(jax.random.PRNGKey(4), 14, HID, 21, L,
                                     HEADS)
    losses = []
    for d in (1, D):
        mesh = make_mesh(("data",), (d,), devices=jax.devices()[:d])
        plan_np = plan_halo_exchange(np.asarray(b.senders),
                                     np.asarray(b.receivers),
                                     np.asarray(b.edge_mask), n, d)
        plan = {k: jnp.asarray(v) for k, v in plan_np.items()
                if k not in ("block_size", "halo_width")}
        _, vg = make_sharded_gps(mesh, L, HEADS)
        xb, gb, okb, yb = shard_node_blocks(
            mesh, d, np.asarray(b.node_feat),
            np.asarray(b.node_graph).astype(np.int32),
            np.asarray(b.node_mask), np.asarray(b.node_y))
        loss, grads = vg(params, xb, gb, okb, plan, yb)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=5e-5)


def test_runner_edge_partitioned_gps():
    """conv_type: gps + mesh.edge_partition routes through the
    ring-attention sharded GPS."""
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment

    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 10},
        "mp": {"conv_type": "gps", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.0,
               "num_heads": 2},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gps", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 3, "eval_period": 2, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    cfg = parse_config(raw)
    result = run_experiment(cfg)
    assert result.epochs_run == 3
    assert np.isfinite(result.history[-1]["train_loss"])
    assert "validation_perf" in result.history[-1]


def test_sharded_gps_bf16_tracks_f32():
    """dtype=bfloat16 GPS: f32 residual stream + softmax stats, bf16
    matmuls and ring K/V payloads; forward tracks the f32 path."""
    b, plan, n = _setup()
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_gps_params(jax.random.PRNGKey(12), 14, HID, 21,
                                     L, HEADS)
    fwd32, _ = make_sharded_gps(mesh, L, HEADS)
    fwd16, vg16 = make_sharded_gps(mesh, L, HEADS, dtype=jnp.bfloat16)
    xb, gb, okb, yb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat),
        np.asarray(b.node_graph).astype(np.int32),
        np.asarray(b.node_mask), np.asarray(b.node_y))
    out32 = np.asarray(fwd32(params, xb, gb, okb, plan))
    out16 = np.asarray(fwd16(params, xb, gb, okb, plan))
    assert out16.dtype == np.float32
    scale = np.abs(out32).max()
    assert np.abs(out16 - out32).max() <= 0.05 * scale

    loss, grads = vg16(params, xb, gb, okb, plan, yb)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def _map_params_gated(p, num_layers):
    """Sharded gatedgcn-local param pytree -> flax GPSModel variables
    (GatedGCNConv declares A..E as Dense_0..4; top-level Dense_1 is the
    edge encoder, Dense_2 the class head)."""
    out = {"Dense_0": {"kernel": p["in"]["kernel"],
                       "bias": p["in"]["bias"]},
           "Dense_1": p["enc_e"]}
    for i, layer in enumerate(p["layers"]):
        g = layer["local"]
        out[f"GPSLayer_{i}"] = {
            "LayerNorm_0": layer["ln1"],
            "GatedGCNConv_0": {
                f"Dense_{j}": g[name]
                for j, name in enumerate("ABCDE")},
            "LayerNorm_1": layer["ln2"],
            "GraphMHA_0": {
                "query": {"kernel": layer["attn"]["wq"],
                          "bias": layer["attn"]["bq"]},
                "key": {"kernel": layer["attn"]["wk"],
                        "bias": layer["attn"]["bk"]},
                "value": {"kernel": layer["attn"]["wv"],
                          "bias": layer["attn"]["bv"]},
                "out": {"kernel": layer["attn"]["wo"],
                        "bias": layer["attn"]["bo"]},
            },
            "LayerNorm_2": layer["ln3"],
            "Dense_0": layer["ffn1"],
            "Dense_1": layer["ffn2"],
        }
    out["LayerNorm_0"] = p["ln_f"]
    out["Dense_2"] = p["head"]
    return {"params": out}


def test_sharded_gps_gatedgcn_local_matches_flax():
    """Ring GPS with the GatedGCN local block (round-4: the last
    family refusal removed) vs the flax GPSModel(local_conv=gatedgcn)
    with mapped weights — WITH real edge features (peptides bonds)."""
    from graph_hscn_tpu.data.synthetic import make_peptides_func
    from graph_hscn_tpu.parallel.sharded_gatedgcn import gather_edge_groups

    graphs = make_peptides_func(num_graphs=8, seed=5, mean_nodes=40)
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    budget = PadBudget.for_dataset(graphs, batch_size=8)
    b = pack_batch(graphs, budget, slot_nodes=slot)
    n = b.num_nodes_padded
    assert n % D == 0
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    el, eh = gather_edge_groups(np.asarray(b.edge_feat), plan_np)
    from graph_hscn_tpu.parallel.edge_partition import shard_arrays
    mesh = make_mesh(("data",), (D,))
    plan["e_loc"], plan["e_hal"] = shard_arrays(mesh, el, eh)

    fe = b.edge_feat.shape[-1]
    params = init_sharded_gps_params(jax.random.PRNGKey(9), 9, HID, 10, L,
                                     HEADS, local_conv="gatedgcn",
                                     edge_features=fe)
    forward, vg = make_sharded_gps(mesh, L, HEADS, local_conv="gatedgcn")
    xb, gb, okb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat),
        np.asarray(b.node_graph).astype(np.int32),
        np.asarray(b.node_mask))
    out = np.asarray(forward(params, xb, gb, okb, plan)).reshape(n, -1)

    flax_model = GPSModel(num_features=9, hidden_channels=HID,
                          num_classes=10, num_layers=L, num_heads=HEADS,
                          dropout=0.0, readout="none",
                          local_conv="gatedgcn")
    ref = np.asarray(flax_model.apply(_map_params_gated(params, L), b,
                                      train=False))
    mask = np.asarray(b.node_mask)
    np.testing.assert_allclose(out[mask], ref[mask], rtol=3e-4, atol=3e-4)

    # Gradients finite through the gated local block + ring.
    yb_np = np.zeros((n, 10), np.float32)
    yb_np[np.arange(n), np.arange(n) % 10] = 1.0
    (yb,) = shard_node_blocks(mesh, D, yb_np)
    loss, grads = vg(params, xb, gb, okb, plan, yb)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


def test_cli_gps_gatedgcn_local_trains():
    """CLI: conv_type gps + gps_local_conv gatedgcn on the edge-partition
    mesh trains (previously a config-time refusal)."""
    from graph_hscn_tpu.config.config import parse_config
    from graph_hscn_tpu.runner import run_experiment
    raw = {
        "data": {"dataset_name": "voc_superpixels", "batch_size": 4,
                 "num_graphs": 8},
        "mp": {"conv_type": "gps", "activation": "relu",
               "hidden_channels": 8, "num_layers": 2, "dropout": 0.1,
               "num_heads": 2, "gps_local_conv": "gatedgcn"},
        "optim": {"optim_type": "adamW", "lr": 0.01,
                  "weight_decay": 5e-4},
        "training": {"model_type": "gps", "use_wandb": False,
                     "loss_fn": "softmax_cross_entropy", "metric": "f1",
                     "max_epochs": 2, "eval_period": 1, "min_delta": 0.0,
                     "patience": 50},
        "mesh": {"axes": ["data"], "shape": [8], "edge_partition": True},
    }
    r = run_experiment(parse_config(raw))
    assert np.isfinite(r.history[-1]["train_loss"])


def test_sharded_gps_gatedgcn_bf16_tracks_f32():
    """bf16 mixed precision composes with the gated local block."""
    b, plan, n = _setup()   # VOC graphs, no edge features (ones encoder)
    mesh = make_mesh(("data",), (D,))
    params = init_sharded_gps_params(jax.random.PRNGKey(4), 14, HID, 21, L,
                                     HEADS, local_conv="gatedgcn")
    fw32, _ = make_sharded_gps(mesh, L, HEADS, local_conv="gatedgcn")
    fw16, vg16 = make_sharded_gps(mesh, L, HEADS, local_conv="gatedgcn",
                                  dtype=jnp.bfloat16)
    xb, gb, okb = shard_node_blocks(
        mesh, D, np.asarray(b.node_feat),
        np.asarray(b.node_graph).astype(np.int32),
        np.asarray(b.node_mask))
    o32 = np.asarray(fw32(params, xb, gb, okb, dict(plan))).reshape(n, -1)
    o16 = np.asarray(fw16(params, xb, gb, okb, dict(plan))).reshape(n, -1)
    assert o16.dtype == np.float32
    m = np.asarray(b.node_mask)
    np.testing.assert_allclose(o16[m], o32[m], rtol=0.15, atol=0.25)
    yb_np = np.zeros((n, 21), np.float32)
    yb_np[np.arange(n), np.arange(n) % 21] = 1.0
    (yb,) = shard_node_blocks(mesh, D, yb_np)
    loss, grads = vg16(params, xb, gb, okb, dict(plan), yb)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.asarray(g).dtype == np.float32
        assert np.all(np.isfinite(np.asarray(g)))
