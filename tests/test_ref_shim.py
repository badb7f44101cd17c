"""Tests for the reference-execution shim (scripts/ref_shim/).

Two layers of assurance behind the executed parity artifact
(PARITY_RESULT.json):

1. numeric: each shim conv matches an independent dense numpy oracle of
   the PyG semantics it re-implements (GCNConv's symmetric normalization,
   GATConv's ragged softmax attention, GraphConv's root+rel split,
   dense_mincut_pool's loss terms);
2. executable: the mounted reference's CLI actually runs end-to-end under
   the shim on seeded synthetic data and emits parseable eval lines.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

REPO = Path(__file__).resolve().parent.parent
SHIM = REPO / "scripts" / "ref_shim"


@pytest.fixture(scope="module", autouse=True)
def shim_on_path():
    sys.path.insert(0, str(SHIM))
    # Ensure fresh imports resolve to the shim (nothing else provides
    # torch_geometric/torch_scatter in this image).
    yield
    sys.path.remove(str(SHIM))


def _rand_graph(n=13, e=40, f=5, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return (torch.tensor(np.stack([src, dst]), dtype=torch.long),
            torch.tensor(x))


def test_shim_gcn_conv_matches_dense_oracle():
    from torch_geometric.nn import GCNConv
    edge_index, x = _rand_graph()
    n = x.shape[0]
    conv = GCNConv(5, 7)
    out = conv(x, edge_index)

    # Dense oracle: D^-1/2 (A + I) D^-1/2 X W^T + b with degree taken on
    # the aggregation (column) side, matching PyG gcn_norm.
    a = np.zeros((n, n), dtype=np.float64)
    for s, d in edge_index.T.numpy():
        a[d, s] += 1.0  # messages flow source->target: out[d] += x[s]
    a += np.eye(n)
    deg = a.sum(1)  # in-degree incl. self loop
    dis = deg ** -0.5
    norm_a = dis[:, None] * a * dis[None, :]
    ref = norm_a @ x.numpy().astype(np.float64) @ \
        conv.lin.weight.detach().numpy().T.astype(np.float64) + \
        conv.bias.detach().numpy()
    np.testing.assert_allclose(out.detach().numpy(), ref, rtol=1e-4,
                               atol=1e-5)


def test_shim_gcn_norm_degree_side():
    """gcn_norm normalizes with in-degree on both sides of the product
    (symmetric); check a directed star: edges all into node 0."""
    from torch_geometric.nn.conv.gcn_conv import gcn_norm
    ei = torch.tensor([[1, 2, 3], [0, 0, 0]])
    ei2, w = gcn_norm(ei, None, 4)
    # node 0 in-deg = 3 + 1(self) = 4; nodes 1..3 in-deg = 1 (self only).
    np.testing.assert_allclose(w[:3].numpy(), (1 / np.sqrt(1)) *
                               (1 / np.sqrt(4)) * np.ones(3), rtol=1e-6)


def test_shim_gat_conv_matches_dense_oracle():
    from torch_geometric.nn import GATConv
    edge_index, x = _rand_graph(n=9, e=25)
    n = x.shape[0]
    conv = GATConv(5, 6)  # heads=1, add_self_loops=True
    out = conv(x, edge_index)

    w = conv.lin_src.weight.detach().numpy().astype(np.float64)
    a_src = conv.att_src.detach().numpy().reshape(-1).astype(np.float64)
    a_dst = conv.att_dst.detach().numpy().reshape(-1).astype(np.float64)
    xw = x.numpy().astype(np.float64) @ w.T
    ei = np.concatenate([edge_index.numpy(),
                         np.stack([np.arange(n), np.arange(n)])], axis=1)
    logits = xw[ei[0]] @ a_src + xw[ei[1]] @ a_dst
    logits = np.where(logits > 0, logits, 0.2 * logits)  # LeakyReLU
    ref = np.zeros((n, 6))
    for d in range(n):
        m = ei[1] == d
        if not m.any():
            continue
        al = np.exp(logits[m] - logits[m].max())
        al = al / al.sum()
        ref[d] = (al[:, None] * xw[ei[0][m]]).sum(0)
    ref += conv.bias.detach().numpy()
    np.testing.assert_allclose(out.detach().numpy(), ref, rtol=1e-4,
                               atol=1e-5)


def test_shim_graph_conv_matches_oracle():
    from torch_geometric.nn import GraphConv
    edge_index, x = _rand_graph(n=8, e=20)
    conv = GraphConv(5, 4)
    ew = torch.rand(edge_index.shape[1])
    out = conv(x, edge_index, ew)
    agg = np.zeros((8, 5))
    for k, (s, d) in enumerate(edge_index.T.numpy()):
        agg[d] += ew[k].item() * x[s].numpy()
    ref = agg @ conv.lin_rel.weight.detach().numpy().T + \
        conv.lin_rel.bias.detach().numpy() + \
        x.numpy() @ conv.lin_root.weight.detach().numpy().T
    np.testing.assert_allclose(out.detach().numpy(), ref, rtol=1e-4,
                               atol=1e-5)


def test_shim_mincut_pool_losses():
    from torch_geometric.nn import dense_mincut_pool
    rng = np.random.default_rng(3)
    n, k, f = 12, 3, 4
    x = torch.tensor(rng.normal(size=(n, f)).astype(np.float32))
    adj_np = (rng.random((n, n)) < 0.3).astype(np.float32)
    adj_np = np.triu(adj_np, 1)
    adj_np = adj_np + adj_np.T
    adj = torch.tensor(adj_np).unsqueeze(0)
    s_logits = torch.tensor(rng.normal(size=(n, k)).astype(np.float32))
    _, _, mc, ortho = dense_mincut_pool(x, adj, s_logits)

    s = torch.softmax(s_logits, -1).numpy().astype(np.float64)
    num = np.trace(s.T @ adj_np @ s)
    den = np.trace(s.T @ np.diag(adj_np.sum(1)) @ s)
    assert abs(mc.item() - (-num / (den + 1e-15))) < 1e-5
    ss = s.T @ s
    ortho_ref = np.linalg.norm(ss / np.linalg.norm(ss)
                               - np.eye(k) / np.sqrt(k))
    assert abs(ortho.item() - ortho_ref) < 1e-5


def test_shim_collate_separate_roundtrip_and_batching():
    from torch_geometric.data import Data, collate, separate
    from torch_geometric.data.batch import Batch
    graphs = []
    for i, (n, e) in enumerate([(4, 6), (3, 2), (5, 8)]):
        ei, x = _rand_graph(n=n, e=e, seed=i)
        graphs.append(Data(x=x, edge_index=ei,
                           y=torch.randn(1, 10)))
    data, slices = collate(graphs)
    for i, g in enumerate(graphs):
        got = separate(data, slices, i, len(graphs))
        assert torch.equal(got.x, g.x)
        assert torch.equal(got.edge_index, g.edge_index)
        assert torch.equal(got.y, g.y)
    b = Batch.from_data_list(graphs)
    assert b.x.shape[0] == 12 and b.y.shape == (3, 10)
    assert b.batch.tolist() == [0] * 4 + [1] * 3 + [2] * 5
    # Per-graph edges offset by cumulative node counts.
    assert int(b.edge_index[:, 6:8].min()) >= 4
    # Missing attributes resolve to None (PyG-1.x semantics the reference
    # needs, train_clustering.py:39).
    assert graphs[0].edge_weight is None


# ---------------------------------------------------------------------------
# Per-layer parity vs the EXECUTED reference modules (round-4 verdict #3):
# the mounted graph_hscn.model.* modules run under the shim in a subprocess
# (scripts/ref_shim/dump_module_oracle.py), their weights are mapped onto
# the flax models, and every layer's activations must allclose.
# ---------------------------------------------------------------------------

def _parity_graphs(num=3, f=5, seed=7, clusters=None):
    """Small deterministic graphs; with ``clusters`` K, every cluster is
    non-empty per graph (keeps the reference's np.unique remap the
    identity so quirk #8's rotation is exactly (c-1) mod K)."""
    from graph_hscn_tpu.data.batching import GraphData
    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(num):
        n = int(rng.integers(3 * (clusters or 1) + 3, 12 + 3 * (clusters or 1)))
        src = np.arange(n - 1)
        dst = np.arange(1, n)
        extra = rng.integers(0, n, size=(2, max(2, n // 3)))
        ei = np.stack([np.concatenate([src, dst, extra[0]]),
                       np.concatenate([dst, src, extra[1]])])
        key = ei[0] * n + ei[1]
        _, uniq = np.unique(key, return_index=True)
        ei = ei[:, np.sort(uniq)].astype(np.int64)
        g = GraphData(x=rng.normal(size=(n, f)).astype(np.float32),
                      edge_index=ei, edge_attr=None,
                      y=np.zeros(4, np.float32))
        if clusters is not None:
            c = rng.integers(0, clusters, size=n)
            c[:clusters] = np.arange(clusters)   # every cluster non-empty
            g = g.replace(cluster=c.astype(np.int64))
        graphs.append(g)
    return graphs


def _dump_oracle(tmp_path, graphs, mode, **flags):
    inputs = {}
    node_ptr, edge_ptr = [0], [0]
    xs, eis, cs = [], [], []
    for g in graphs:
        xs.append(g.x)
        eis.append(g.edge_index)
        if g.cluster is not None:
            cs.append(g.cluster)
        node_ptr.append(node_ptr[-1] + g.num_nodes)
        edge_ptr.append(edge_ptr[-1] + g.num_edges)
    inputs["node_feat"] = np.concatenate(xs, axis=0)
    inputs["edge_index"] = np.concatenate(eis, axis=1)
    inputs["node_ptr"] = np.asarray(node_ptr)
    inputs["edge_ptr"] = np.asarray(edge_ptr)
    if cs:
        inputs["cluster"] = np.concatenate(cs)
    in_path = tmp_path / "inputs.npz"
    out_path = tmp_path / "oracle.npz"
    np.savez(in_path, **inputs)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = f"{SHIM}:/root/reference"
    cmd = [sys.executable, str(SHIM / "dump_module_oracle.py"),
           "--mode", mode, "--inputs", str(in_path), "--out", str(out_path),
           "--log", str(tmp_path / "oracle.log")]
    for k, v in flags.items():
        cmd += [f"--{k}", str(v)]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return dict(np.load(out_path))


def _pack(graphs):
    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    budget = PadBudget.for_dataset(graphs, batch_size=len(graphs))
    return pack_batch(graphs, budget)


def _set(params, path, torch_w, transpose=False):
    node = params
    for p in path[:-1]:
        node = node[p]
    w = np.asarray(torch_w)
    if transpose:
        w = w.T
    assert node[path[-1]].shape == w.shape, (path, node[path[-1]].shape,
                                             w.shape)
    node[path[-1]] = jnp.asarray(w)


def _intermediate(state, name):
    return np.asarray(state["intermediates"][name]["__call__"][0])


def _run_mpnn_module_parity(tmp_path, conv):
    import flax

    from graph_hscn_tpu.models.mpnn import MPNN
    graphs = _parity_graphs()
    oracle = _dump_oracle(tmp_path, graphs, "mpnn", conv=conv,
                          hidden=8, layers=3, classes=4)
    batch = _pack(graphs)
    model = MPNN(conv_type=conv, activation="relu", num_features=5,
                 hidden_channels=8, num_classes=4, num_layers=3,
                 dropout=0.0, compat_double_relu=True)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    params = flax.core.unfreeze(variables)["params"]
    layer = "GCNConv" if conv == "gcn" else "GATConv"
    for i in range(3):
        if conv == "gcn":
            _set(params, [f"{layer}_{i}", "kernel"],
                 oracle[f"w::conv_layers.{i}.lin.weight"], transpose=True)
            _set(params, [f"{layer}_{i}", "bias"],
                 oracle[f"w::conv_layers.{i}.bias"])
        else:
            _set(params, [f"{layer}_{i}", "kernel_src"],
                 oracle[f"w::conv_layers.{i}.lin_src.weight"],
                 transpose=True)
            _set(params, [f"{layer}_{i}", "att_src"],
                 oracle[f"w::conv_layers.{i}.att_src"])
            _set(params, [f"{layer}_{i}", "att_dst"],
                 oracle[f"w::conv_layers.{i}.att_dst"])
            _set(params, [f"{layer}_{i}", "bias"],
                 oracle[f"w::conv_layers.{i}.bias"])
    out, state = model.apply(
        {"params": params}, batch, train=False,
        capture_intermediates=True, mutable=["intermediates"])
    mask = np.asarray(batch.node_mask)
    for i in range(3):
        got = _intermediate(state, f"{layer}_{i}")[mask]
        np.testing.assert_allclose(got, oracle[f"act_{i}"],
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"{conv} layer {i}")
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(out)[gm], oracle["out"],
                               rtol=1e-4, atol=1e-5)


def test_module_parity_mpnn_gcn(tmp_path):
    """Flax MPNN-GCN == the executed reference MPNN(GCNConv), layer by
    layer (weights transplanted; quirk #1 double relu live on both)."""
    _run_mpnn_module_parity(tmp_path, "gcn")


def test_module_parity_mpnn_gat(tmp_path):
    """Flax MPNN-GAT == the executed reference MPNN(GATConv) (heads=1,
    the only GAT the reference can express), layer by layer."""
    _run_mpnn_module_parity(tmp_path, "gat")


def test_module_parity_scn(tmp_path):
    """Flax SCN == the executed reference SCN: GraphConv stack output and
    softmax cluster assignments allclose with transplanted weights; the
    MinCUT/ortho losses allclose given the adjacency the reference's
    dense_mincut_pool actually saw (A+I — its to_dense_adj runs on the
    post-gcn_norm edge_index, quirk #7 ledger)."""
    import flax

    from graph_hscn_tpu.models.scn import SCN
    from graph_hscn_tpu.ops.dense import mincut_pool
    graphs = _parity_graphs(num=1)
    oracle = _dump_oracle(tmp_path, graphs, "scn", hidden=8, clusters=3)
    batch = _pack(graphs)
    model = SCN(mp_units=[8], mp_act="relu", num_clusters=3,
                max_nodes=int(np.asarray(batch.node_mask).sum()))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    params = flax.core.unfreeze(variables)["params"]
    _set(params, ["GraphConv_0", "kernel_rel"],
         oracle["w::mp._mods.0.lin_rel.weight"], transpose=True)
    _set(params, ["GraphConv_0", "bias"],
         oracle["w::mp._mods.0.lin_rel.bias"])
    _set(params, ["GraphConv_0", "kernel_root"],
         oracle["w::mp._mods.0.lin_root.weight"], transpose=True)
    _set(params, ["Dense_0", "kernel"], oracle["w::mlp.0.weight"],
         transpose=True)
    _set(params, ["Dense_0", "bias"], oracle["w::mlp.0.bias"])
    (s, mc, o), state = model.apply(
        {"params": params}, batch, train=False,
        capture_intermediates=True, mutable=["intermediates"])
    mask = np.asarray(batch.node_mask)
    # The reference's mp Sequential ends in the activation (hscn.py:30-45),
    # so its captured output is post-relu; our intermediate is pre-relu.
    np.testing.assert_allclose(
        np.maximum(_intermediate(state, "GraphConv_0")[mask], 0.0),
        oracle["mp_out"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s)[mask], oracle["s"],
                               rtol=1e-4, atol=1e-5)
    # Loss parity on identical inputs: replay our mincut_pool on the
    # adjacency the reference used (A+I) with its mp features + logits.
    s_logits = _intermediate(state, "Dense_0")[mask]
    mc2, o2 = mincut_pool(
        jnp.asarray(oracle["mp_out"])[None],
        jnp.asarray(oracle["adj_used"]),
        jnp.asarray(s_logits)[None])[2:]
    np.testing.assert_allclose(float(mc2), float(oracle["mc_loss"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(o2), float(oracle["o_loss"]),
                               rtol=1e-4, atol=1e-5)
    # And the documented deviation: our in-model MinCUT runs on A
    # (weights-dropped, no self loops) — same sign, different diagonal.
    assert np.isfinite(float(mc)) and np.isfinite(float(o))


def test_module_parity_hscn(tmp_path):
    """Flax HSCN == the executed reference HSCN pipeline
    (generate_hetero_data with quirks #8/#9 live + HeteroConv stack):
    per-layer local/virtual pre-relu activations and the head output
    allclose with transplanted weights; initial virtual features match
    the reference's rotated grouping (index_shift=True)."""
    import flax

    from graph_hscn_tpu.models.hscn import HSCN, virtual_node_features
    graphs = _parity_graphs(num=2, clusters=3)
    oracle = _dump_oracle(tmp_path, graphs, "hscn", hidden=8, layers=2,
                          classes=4, clusters=3)
    batch = _pack(graphs)
    K, L = 3, 2
    model = HSCN(lv_conv="GAT", ll_conv="GCN", vv_conv="GCN",
                 activation="relu", hidden_channels=8, num_classes=4,
                 num_layers=L, num_clusters=K, vv_pattern="triangular",
                 index_shift=True)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    params = flax.core.unfreeze(variables)["params"]
    for i in range(L):
        pre = f"w::convs.{i}.convs"
        _set(params, [f"GCNConv_{i}", "kernel"],
             oracle[f"{pre}.local__to__local.lin.weight"], transpose=True)
        _set(params, [f"GCNConv_{i}", "bias"],
             oracle[f"{pre}.local__to__local.bias"])
        _set(params, [f"GATConv_{i}", "kernel_src"],
             oracle[f"{pre}.local__to__virtual.lin_src.weight"],
             transpose=True)
        _set(params, [f"GATConv_{i}", "kernel_dst"],
             oracle[f"{pre}.local__to__virtual.lin_dst.weight"],
             transpose=True)
        _set(params, [f"GATConv_{i}", "att_src"],
             oracle[f"{pre}.local__to__virtual.att_src"])
        _set(params, [f"GATConv_{i}", "att_dst"],
             oracle[f"{pre}.local__to__virtual.att_dst"])
        _set(params, [f"GATConv_{i}", "bias"],
             oracle[f"{pre}.local__to__virtual.bias"])
        _set(params, [f"DenseGCN_{i}", "kernel"],
             oracle[f"{pre}.virtual__to__virtual.lin.weight"],
             transpose=True)
        _set(params, [f"DenseGCN_{i}", "bias"],
             oracle[f"{pre}.virtual__to__virtual.bias"])
    _set(params, ["Dense_0", "kernel"], oracle["w::lin_1.weight"],
         transpose=True)
    _set(params, ["Dense_0", "bias"], oracle["w::lin_1.bias"])
    _set(params, ["Dense_1", "kernel"], oracle["w::lin_2.weight"],
         transpose=True)
    _set(params, ["Dense_1", "bias"], oracle["w::lin_2.bias"])

    # Initial virtual features: executed hetero rewrite vs tensorized.
    x_v, v_active, _ = virtual_node_features(batch, K, index_shift=True)
    np.testing.assert_allclose(
        np.asarray(x_v)[np.asarray(v_active)], oracle["x_virtual_init"],
        rtol=1e-5, atol=1e-6)

    out, state = model.apply(
        {"params": params}, batch, train=False,
        capture_intermediates=True, mutable=["intermediates"])
    mask = np.asarray(batch.node_mask)
    va = np.asarray(v_active)
    for i in range(L):
        np.testing.assert_allclose(
            _intermediate(state, f"GCNConv_{i}")[mask],
            oracle[f"local_{i}"], rtol=1e-4, atol=1e-5,
            err_msg=f"ll layer {i}")
        lv = _intermediate(state, f"GATConv_{i}")
        vv = _intermediate(state, f"DenseGCN_{i}").reshape(lv.shape)
        np.testing.assert_allclose(
            (lv + vv)[va], oracle[f"virtual_{i}"], rtol=1e-4, atol=1e-5,
            err_msg=f"virtual layer {i}")
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(out)[gm], oracle["out"],
                               rtol=1e-4, atol=1e-5)


def test_module_parity_hscn_empty_cluster(tmp_path):
    """Quirk #8 in COMPACTED space: with an unoccupied cluster the
    reference remaps occupied ids with np.unique and rotates among the
    occupied set (cyclically-previous ACTIVE cluster, not (c-1) mod K).
    virtual_node_features(index_shift=True) must reproduce that exactly."""
    import flax

    from graph_hscn_tpu.models.hscn import HSCN, virtual_node_features
    rng = np.random.default_rng(21)
    graphs = _parity_graphs(num=2, clusters=3, seed=21)
    # Leave cluster 1 empty in graph 0 (occupied {0, 2}) and cluster 0
    # empty in graph 1 (occupied {1, 2}).
    fixed = []
    for gi, g in enumerate(graphs):
        n = g.num_nodes
        allowed = np.array([0, 2]) if gi == 0 else np.array([1, 2])
        c = allowed[rng.integers(0, 2, size=n)]
        c[0], c[1] = allowed[0], allowed[1]   # both occupied
        fixed.append(g.replace(cluster=c.astype(np.int64)))
    graphs = fixed
    oracle = _dump_oracle(tmp_path, graphs, "hscn", hidden=8, layers=1,
                          classes=4, clusters=3)
    batch = _pack(graphs)
    K = 3
    x_v, v_active, _ = virtual_node_features(batch, K, index_shift=True)
    np.testing.assert_allclose(
        np.asarray(x_v)[np.asarray(v_active)], oracle["x_virtual_init"],
        rtol=1e-5, atol=1e-6)

    model = HSCN(lv_conv="GAT", ll_conv="GCN", vv_conv="GCN",
                 activation="relu", hidden_channels=8, num_classes=4,
                 num_layers=1, num_clusters=K, vv_pattern="triangular",
                 index_shift=True)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    params = flax.core.unfreeze(variables)["params"]
    pre = "w::convs.0.convs"
    _set(params, ["GCNConv_0", "kernel"],
         oracle[f"{pre}.local__to__local.lin.weight"], transpose=True)
    _set(params, ["GCNConv_0", "bias"],
         oracle[f"{pre}.local__to__local.bias"])
    _set(params, ["GATConv_0", "kernel_src"],
         oracle[f"{pre}.local__to__virtual.lin_src.weight"], transpose=True)
    _set(params, ["GATConv_0", "kernel_dst"],
         oracle[f"{pre}.local__to__virtual.lin_dst.weight"], transpose=True)
    _set(params, ["GATConv_0", "att_src"],
         oracle[f"{pre}.local__to__virtual.att_src"])
    _set(params, ["GATConv_0", "att_dst"],
         oracle[f"{pre}.local__to__virtual.att_dst"])
    _set(params, ["GATConv_0", "bias"],
         oracle[f"{pre}.local__to__virtual.bias"])
    _set(params, ["DenseGCN_0", "kernel"],
         oracle[f"{pre}.virtual__to__virtual.lin.weight"], transpose=True)
    _set(params, ["DenseGCN_0", "bias"],
         oracle[f"{pre}.virtual__to__virtual.bias"])
    _set(params, ["Dense_0", "kernel"], oracle["w::lin_1.weight"],
         transpose=True)
    _set(params, ["Dense_0", "bias"], oracle["w::lin_1.bias"])
    _set(params, ["Dense_1", "kernel"], oracle["w::lin_2.weight"],
         transpose=True)
    _set(params, ["Dense_1", "bias"], oracle["w::lin_2.bias"])
    out, state = model.apply(
        {"params": params}, batch, train=False,
        capture_intermediates=True, mutable=["intermediates"])
    va = np.asarray(v_active)
    lv = _intermediate(state, "GATConv_0")
    vv = _intermediate(state, "DenseGCN_0").reshape(lv.shape)
    np.testing.assert_allclose((lv + vv)[va], oracle["virtual_0"],
                               rtol=1e-4, atol=1e-5)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(out)[gm], oracle["out"],
                               rtol=1e-4, atol=1e-5)


def test_hetero_loader_split_scramble(tmp_path):
    """Pin the effective-splits derivation (parity_run.py
    reference_effective_splits) against the EXECUTED reference: its
    ``generate_hetero_data`` builds the hetero list in train/val/test
    position order (hetero_data.py:34-42) but ``hetero_loaders`` indexes
    it with original dataset ids (hetero_data.py:97-99) — quirk #16.
    Each graph carries a unique y id, so the graphs each loader actually
    yields identify the reference's EFFECTIVE partition exactly."""
    script = tmp_path / "probe.py"
    script.write_text(
        "import json, sys\n"
        "import numpy as np\n"
        "import torch\n"
        "from torch_geometric.data import Data\n"
        "from graph_hscn.config.config import DataConfig, HSCNConfig\n"
        "from graph_hscn.loader.hetero_data import (generate_hetero_data,\n"
        "    hetero_loaders)\n"
        "from graph_hscn.logger import CustomLogger\n"
        "n_graphs = 10\n"
        "dataset = []\n"
        "rng = np.random.default_rng(0)\n"
        "for i in range(n_graphs):\n"
        "    n = int(rng.integers(4, 8))\n"
        "    src = np.arange(n - 1); dst = np.arange(1, n)\n"
        "    ei = np.stack([np.concatenate([src, dst]),\n"
        "                   np.concatenate([dst, src])])\n"
        "    dataset.append(Data(\n"
        "        x=torch.randn(n, 3),\n"
        "        edge_index=torch.tensor(ei, dtype=torch.long),\n"
        "        y=torch.tensor([[float(i)]])))\n"
        "split_idx = {'train': torch.tensor([3, 7, 1, 9]),\n"
        "             'val': torch.tensor([0, 5, 2]),\n"
        "             'test': torch.tensor([8, 4, 6])}\n"
        "cluster_lst = [np.zeros(d.num_nodes, dtype=np.int64)\n"
        "               for d in dataset]\n"
        "data_cfg = DataConfig.parse_obj({'dataset_name': 'peptides_func',\n"
        "    'pe': False, 'batch_size': 1, 'num_workers': 0})\n"
        "model_cfg = HSCNConfig.parse_obj({'activation': 'relu',\n"
        "    'hidden_channels': 4, 'num_layers': 1, 'num_clusters': 3,\n"
        "    'cluster_epochs': 1})\n"
        "logger = CustomLogger(sys.argv[1], metric_name='ap')\n"
        "h_data = generate_hetero_data(cluster_lst, dataset, split_idx,\n"
        "                              data_cfg, model_cfg, logger)\n"
        "loaders = hetero_loaders(data_cfg, h_data, split_idx)\n"
        "out = {}\n"
        "for name, loader in zip(['train', 'val', 'test'], loaders):\n"
        "    ids = []\n"
        "    for batch in loader:\n"
        "        ids.extend(int(v) for v in\n"
        "                   batch['local'].y.flatten().tolist())\n"
        "    out[name] = sorted(ids)\n"
        "print('SPLITS=' + json.dumps(out))\n")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = f"{SHIM}:/root/reference"
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "probe.log")],
        capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    import json
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("SPLITS=")][0]
    executed = json.loads(line[len("SPLITS="):])

    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import parity_run
        derived = parity_run.reference_effective_splits({
            "train": np.array([3, 7, 1, 9]),
            "val": np.array([0, 5, 2]),
            "test": np.array([8, 4, 6])})
    finally:
        sys.path.remove(str(REPO / "scripts"))
    for k in ("train", "val", "test"):
        assert executed[k] == sorted(derived[k].tolist()), (
            k, executed[k], derived[k])
    # And the scramble is real: the effective partition differs from the
    # true one (otherwise this test would pass vacuously).
    assert executed["test"] != sorted([8, 4, 6])


def test_reference_gin_config_crashes():
    """Document-by-execution why GIN has no parity entry: the reference
    lists "gin" in CONV_DICT (config.py:19-23) but MPNN constructs
    ``GINConv(num_features, hidden)`` (mpnn.py:29-32) — GINConv's first
    argument is an ``nn`` module, so the conv's update net is an int and
    the first forward raises TypeError.  Same failure in real PyG."""
    script = (
        "import torch\n"
        "from graph_hscn.config.config import MPNNConfig\n"
        "from graph_hscn.model.mpnn import build_mpnn\n"
        "cfg = MPNNConfig.parse_obj({'conv_type': 'gin',\n"
        "    'activation': 'relu', 'hidden_channels': 8, 'num_layers': 2,\n"
        "    'dropout': 0.0, 'use_batch_norm': False,\n"
        "    'use_layer_norm': False})\n"
        "model = build_mpnn(cfg, 5, 3)\n"
        "from torch_geometric.data import Data\n"
        "from torch_geometric.data.batch import Batch\n"
        "d = Data(x=torch.randn(4, 5),\n"
        "         edge_index=torch.tensor([[0, 1, 2], [1, 2, 3]]),\n"
        "         y=torch.zeros(1, 3))\n"
        "batch = Batch.from_data_list([d])\n"
        "try:\n"
        "    model(batch)\n"
        "except TypeError as e:\n"
        "    print('GIN_FORWARD_TYPEERROR:', e)\n"
        "else:\n"
        "    raise SystemExit('expected the reference GIN config to "
        "crash')\n")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = f"{SHIM}:/root/reference"
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "GIN_FORWARD_TYPEERROR" in proc.stdout


@pytest.mark.slow
def test_reference_executes_under_shim(tmp_path):
    """The mounted reference CLI trains end-to-end in-image (micro run)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "export_synthetic_npz.py"),
         "--dataset", "peptides_func", "--num-graphs", "24",
         "--out", str(tmp_path)],
        check=True, timeout=600)
    ref_root = tmp_path / "ref"
    import shutil
    shutil.copytree("/root/reference", ref_root)
    for p in ref_root.rglob("*"):
        os.chmod(p, os.stat(p).st_mode | 0o200)
    env["PYTHONPATH"] = f"{SHIM}:{ref_root}"
    subprocess.run(
        [sys.executable, str(SHIM / "seed_reference_data.py"),
         "--npz", str(tmp_path / "peptides_func.npz"),
         "--dataset", "peptides_func", "--ref-root", str(ref_root)],
        check=True, env=env, timeout=600)
    import yaml
    cfg = yaml.safe_load(
        (ref_root / "configs" / "GCN" / "peptides_func_GCN.yaml")
        .read_text())
    cfg["data"]["pe"] = False
    cfg["training"]["epochs"] = 2
    cfg["training"]["eval_period"] = 1
    (ref_root / "configs" / "micro.yaml").write_text(yaml.safe_dump(cfg))
    proc = subprocess.run(
        [sys.executable, str(SHIM / "run_reference.py"),
         "--cfg", "configs/micro.yaml"],
        cwd=ref_root, env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import parity_run
        val, metric = parity_run.best_val_test_metric(
            proc.stdout + proc.stderr)
    finally:
        sys.path.remove(str(REPO / "scripts"))
    assert metric is not None and 0.0 <= metric <= 1.0


@pytest.mark.slow
def test_reference_hscn_pipeline_executes_under_shim(tmp_path):
    """The reference's 4-stage HSCN pipeline (clustering pre-train ->
    hetero rewrite -> HeteroConv training) runs end-to-end in-image via
    run_reference.py (which supplies the mp_units field the reference's
    own schema omits)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "export_synthetic_npz.py"),
         "--dataset", "peptides_func", "--num-graphs", "24",
         "--out", str(tmp_path)],
        check=True, timeout=600)
    ref_root = tmp_path / "ref"
    import shutil
    shutil.copytree("/root/reference", ref_root)
    for p in ref_root.rglob("*"):
        os.chmod(p, os.stat(p).st_mode | 0o200)
    env["PYTHONPATH"] = f"{SHIM}:{ref_root}"
    subprocess.run(
        [sys.executable, str(SHIM / "seed_reference_data.py"),
         "--npz", str(tmp_path / "peptides_func.npz"),
         "--dataset", "peptides_func", "--ref-root", str(ref_root)],
        check=True, env=env, timeout=600)
    import yaml
    cfg = {
        "data": {"dataset_name": "peptides_func", "batch_size": 8,
                 "num_workers": 0, "pe": False},
        "hscn": {"activation": "relu", "hidden_channels": 8,
                 "num_layers": 2, "num_clusters": 3, "cluster_epochs": 1,
                 "mp_units": [8]},
        "optim": {"optim_type": "adamW", "batch_accumulation": 1,
                  "clip_grad_norm": False, "lr": 0.01,
                  "weight_decay": 5e-4},
        "pe": {"use": False},
        "training": {"model_type": "hscn", "use_wandb": True,
                     "loss_fn": "cross_entropy", "metric": "ap",
                     "epochs": 2, "eval_period": 1, "min_delta": 0.01,
                     "patience": 50},
    }
    (ref_root / "configs" / "hscn_micro.yaml").write_text(
        yaml.safe_dump(cfg))
    proc = subprocess.run(
        [sys.executable, str(SHIM / "run_reference.py"),
         "--cfg", "configs/hscn_micro.yaml"],
        cwd=ref_root, env=env, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import parity_run
        _, metric = parity_run.best_val_test_metric(
            proc.stdout + proc.stderr)
    finally:
        sys.path.remove(str(REPO / "scripts"))
    assert metric is not None and 0.0 <= metric <= 1.0


def test_reference_virtual_pathway_inert(tmp_path):
    """Quirk #17, proven by EXECUTION: the reference HSCN's relation set
    (hscn.py:83-94) has no virtual->local edge type and its head pools
    only x_dict["local"] (hscn.py:111), so information flows l->v and
    v->v but never returns — the entire virtual-node pathway (SCN
    clustering, hetero rewrite, lv/vv convs) cannot influence the
    prediction.  The oracle dump runs the same built model twice, the
    second time with the virtual features scrambled (x10 random), and
    the outputs must be bit-identical.

    This is also why quirk #8 (the virtual-feature rotation) is
    output-inert in the shipped architecture.
    """
    graphs = _parity_graphs(num=2, clusters=3)
    oracle = _dump_oracle(tmp_path, graphs, "hscn", hidden=8, layers=2,
                          classes=4, clusters=3)
    np.testing.assert_array_equal(oracle["out"],
                                  oracle["out_virtual_scrambled"])


def test_framework_hscn_mirrors_virtual_inertness():
    """The framework's HSCN mirrors the reference architecture
    faithfully (same three relations, local-only readout), so rotating
    the virtual features (quirk #8 compat flag) must not change the
    output either — the compat flag exists for module-level
    faithfulness (virtual activations match the executed reference),
    not because it can move the metric.  hscn.virtual_feedback (the
    v->l relation the architecture omits) is the opt-in extension that
    makes the virtual pathway live."""
    from graph_hscn_tpu.models.hscn import HSCN
    rng = np.random.default_rng(3)
    graphs = _parity_graphs(num=3, clusters=3, seed=3)
    batch = _pack(graphs)
    kw = dict(lv_conv="GAT", ll_conv="GCN", vv_conv="GCN",
              activation="relu", hidden_channels=8, num_classes=4,
              num_layers=2, num_clusters=3, vv_pattern="triangular")
    m0 = HSCN(**kw, index_shift=False)
    m1 = HSCN(**kw, index_shift=True)
    params = m0.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    o0 = m0.apply({"params": params}, batch, train=False)
    o1 = m1.apply({"params": params}, batch, train=False)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_virtual_feedback_zero_init_is_identity():
    """hscn.virtual_feedback is a strict superset at init: the VLDense
    projections are ZERO-initialized, so an untrained feedback model
    computes exactly the reference-faithful forward (training then grows
    the channel only where it helps — a glorot-init feedback measurably
    hurt, artifacts/VFB_STUDY_R5.json ablation)."""
    from graph_hscn_tpu.models.hscn import HSCN
    graphs = _parity_graphs(num=3, clusters=3, seed=9)
    batch = _pack(graphs)
    kw = dict(lv_conv="GAT", ll_conv="GCN", vv_conv="GCN",
              activation="relu", hidden_channels=8, num_classes=4,
              num_layers=2, num_clusters=3, vv_pattern="triangular")
    m_fb = HSCN(**kw, virtual_feedback=True)
    m_base = HSCN(**kw)
    p_fb = m_fb.init(jax.random.PRNGKey(4), batch, train=False)["params"]
    out_fb = m_fb.apply({"params": p_fb}, batch, train=False)
    p_base = {k: v for k, v in p_fb.items() if not k.startswith("VLDense")}
    out_base = m_base.apply({"params": p_base}, batch, train=False)
    np.testing.assert_array_equal(np.asarray(out_fb), np.asarray(out_base))
