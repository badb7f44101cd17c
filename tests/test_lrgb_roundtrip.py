"""Real-data path fixtures (VERDICT round-1 item 4): the converter logic
(scripts/convert_lrgb.py) with a stubbed smiles2graph + tiny CSV fixture,
round-tripped through data/lrgb.try_load into a real fit() run — so a
schema bug surfaces HERE, not on the RDKit machine where nobody can debug
it.  Reference semantics: peptides_functional.py:77-115 (labels eval,
split pickle), peptides_structural.py:83-86 (z-score).
"""

import gzip
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from convert_lrgb import (SOURCES, TARGET_NAMES, VOC_NUM_CLASSES,
                          convert_peptides, convert_voc)

from graph_hscn_tpu.config.config import (DataConfig, MPNNConfig,
                                          OptimConfig, TrainingConfig)
from graph_hscn_tpu.data import lrgb
from graph_hscn_tpu.data.pipeline import DataModule


def _stub_smiles2graph(smiles: str) -> dict:
    """Deterministic stand-in for ogb.utils.smiles2graph: same output
    schema (node_feat [n,9] int, edge_feat [e,3] int, edge_index [2,e],
    num_nodes), sized by the fake smiles string."""
    rng = np.random.default_rng(abs(hash(smiles)) % (2 ** 32))
    n = int(rng.integers(4, 12))
    # Path graph + a random chord, directed both ways (molecule-like).
    src = np.arange(n - 1)
    dst = src + 1
    ei = np.stack([np.concatenate([src, dst]),
                   np.concatenate([dst, src])])
    return {
        "node_feat": rng.integers(0, 50, size=(n, 9)).astype(np.int64),
        "edge_feat": rng.integers(0, 4, size=(ei.shape[1], 3))
        .astype(np.int64),
        "edge_index": ei.astype(np.int64),
        "num_nodes": n,
    }


def _write_csv(path: Path, dataset: str, rows: int = 10):
    cols = ["smiles"] + (["labels"] if dataset == "peptides_func"
                         else TARGET_NAMES)
    lines = [",".join(cols)]
    rng = np.random.default_rng(0)
    for i in range(rows):
        smiles = f"C{'C' * (i % 5)}N{i}"
        if dataset == "peptides_func":
            labels = list(rng.integers(0, 2, size=10))
            lines.append(f'{smiles},"{labels}"')
        else:
            vals = rng.normal(size=len(TARGET_NAMES)) * 3 + 1
            lines.append(smiles + "," + ",".join(f"{v:.4f}" for v in vals))
    if path.suffix == ".gz":
        with gzip.open(path, "wt") as f:
            f.write("\n".join(lines))
    else:
        path.write_text("\n".join(lines))


def _write_split(path: Path, rows: int = 10):
    # The official pickles hold torch index tensors
    # (peptides_functional.py:108-115) — the fixture does too.
    idx = torch.randperm(rows, generator=torch.Generator().manual_seed(7))
    splits = {"train": idx[:6], "val": idx[6:8], "test": idx[8:]}
    with open(path, "wb") as f:
        pickle.dump(splits, f)
    return {k: v.numpy() for k, v in splits.items()}


@pytest.mark.parametrize("dataset", ["peptides_func", "peptides_struct"])
def test_convert_roundtrip_schema(tmp_path, dataset):
    csv = tmp_path / "data.csv.gz"
    _write_csv(csv, dataset)
    split_np = _write_split(tmp_path / "split.pickle")
    convert_peptides(dataset, csv, tmp_path / "split.pickle", tmp_path,
                     smiles2graph_fn=_stub_smiles2graph)

    graphs, split_idx = lrgb.try_load(tmp_path, dataset)
    assert graphs is not None and len(graphs) == 10
    for k, v in split_np.items():
        np.testing.assert_array_equal(split_idx[k], v)

    # Per-graph content matches the featurizer output exactly.
    for i in (0, 5, 9):
        g = graphs[i]
        ref = _stub_smiles2graph(f"C{'C' * (i % 5)}N{i}")
        np.testing.assert_array_equal(g.x, ref["node_feat"])
        np.testing.assert_array_equal(g.edge_attr, ref["edge_feat"])
        # edge_index was globalized at write time and localized on load.
        np.testing.assert_array_equal(g.edge_index, ref["edge_index"])
        assert g.y is not None
        assert g.y.shape == ((10,) if dataset == "peptides_func"
                             else (11,))

    if dataset == "peptides_struct":
        y = np.stack([g.y for g in graphs])
        np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(0), 1.0, atol=1e-5)


def test_real_data_path_trains(tmp_path):
    """npz cache -> DataModule.from_config(data_dir) -> one real fit()."""
    from graph_hscn_tpu.models.mpnn import build_mpnn
    from graph_hscn_tpu.train.loop import fit
    from graph_hscn_tpu.utils.logger import Logger

    csv = tmp_path / "data.csv.gz"
    _write_csv(csv, "peptides_func", rows=16)
    idx = np.arange(16)
    with open(tmp_path / "split.pickle", "wb") as f:
        pickle.dump({"train": idx[:10], "val": idx[10:13],
                     "test": idx[13:]}, f)
    convert_peptides("peptides_func", csv, tmp_path / "split.pickle",
                     tmp_path, smiles2graph_fn=_stub_smiles2graph)

    dm = DataModule.from_config(
        DataConfig(dataset_name="peptides_func", batch_size=4,
                   data_dir=str(tmp_path)))
    assert dm.num_features == 9 and dm.num_classes == 10
    model = build_mpnn(
        MPNNConfig(conv_type="gcn", activation="relu", hidden_channels=8,
                   num_layers=2, dropout=0.0), dm.num_features,
        dm.num_classes)
    result = fit(model, lambda ep: dm.train_batches(epoch_seed=ep),
                 dm.eval_batches("val"), dm.eval_batches("test"),
                 OptimConfig(optim_type="adamW", lr=1e-2, weight_decay=0.0),
                 TrainingConfig(model_type="gcn", use_wandb=False,
                                loss_fn="cross_entropy", metric="ap",
                                epochs=4, eval_period=2, patience=50,
                                min_delta=0.0),
                 Logger(metric_name="ap"))
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]


def test_convert_voc_roundtrip(tmp_path):
    """LRGB VOC pickle tuples (torch tensors) -> npz -> node-level
    DataModule with one-hot labels."""
    rng = np.random.default_rng(3)
    counts = {"train": 5, "val": 2, "test": 2}
    raw = tmp_path / "raw"
    raw.mkdir()
    originals = {}
    for split, cnt in counts.items():
        gs = []
        for _ in range(cnt):
            n = int(rng.integers(8, 20))
            e = 2 * (n - 1)
            src = np.arange(n - 1)
            ei = np.stack([np.concatenate([src, src + 1]),
                           np.concatenate([src + 1, src])])
            gs.append((torch.tensor(rng.normal(size=(n, 14)),
                                    dtype=torch.float),
                       torch.tensor(rng.uniform(size=(e, 2)),
                                    dtype=torch.float),
                       torch.tensor(ei, dtype=torch.long),
                       torch.tensor(rng.integers(0, VOC_NUM_CLASSES,
                                                 size=n))))
        originals[split] = gs
        with open(raw / f"{split}.pickle", "wb") as f:
            pickle.dump(gs, f)

    convert_voc(raw, tmp_path)
    graphs, split_idx = lrgb.try_load(tmp_path, "voc_superpixels")
    assert len(graphs) == 9
    assert list(split_idx["train"]) == list(range(5))
    assert list(split_idx["val"]) == [5, 6]
    assert list(split_idx["test"]) == [7, 8]
    g0 = graphs[0]
    x0, ea0, ei0, y0 = originals["train"][0]
    np.testing.assert_allclose(g0.x, x0.numpy(), rtol=1e-6)
    np.testing.assert_allclose(g0.edge_attr, ea0.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(g0.edge_index, ei0.numpy())
    assert g0.node_y.shape == (x0.shape[0], VOC_NUM_CLASSES)
    np.testing.assert_array_equal(g0.node_y.argmax(1), y0.numpy())
    assert set(np.unique(g0.node_y)) <= {0.0, 1.0}

    dm = DataModule.from_config(
        DataConfig(dataset_name="voc_superpixels", batch_size=4,
                   data_dir=str(tmp_path)))
    assert dm.task_level == "node"
    assert dm.num_classes == VOC_NUM_CLASSES
    b = dm.example_batch()
    assert b.node_y.shape[-1] == VOC_NUM_CLASSES


def test_sources_cover_all_datasets():
    assert set(SOURCES) == {"peptides_func", "peptides_struct",
                            "voc_superpixels"}
