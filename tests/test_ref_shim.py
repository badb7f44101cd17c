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

import numpy as np
import pytest
import torch

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
