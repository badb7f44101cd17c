#!/usr/bin/env python
"""Convert the original LRGB datasets to the framework's .npz cache.

Run this on a machine WITH network access (+ RDKit + OGB for the peptides
datasets; the training environment has neither); copy the resulting
``<out>/<dataset>.npz`` next to the training job and set
``data.data_dir`` in the config.

The reference performs the same featurization inline
(peptides_functional.py:77-106: pandas CSV -> ogb.utils.smiles2graph per
row -> collate); here the output is the flat array schema documented in
graph_hscn_tpu/data/lrgb.py.  PascalVOC-SP (the node-level task the
reference declines at loader/loader.py:108) converts from the official
LRGB superpixel pickles.

Usage (auto-download, like the reference's dataset class):
  python scripts/convert_lrgb.py --dataset peptides_func --out data/

or with pre-downloaded files:
  python scripts/convert_lrgb.py --dataset peptides_func --csv \
      peptide_multi_class_dataset.csv.gz --split \
      splits_random_stratified_peptide.pickle --out data/

  python scripts/convert_lrgb.py --dataset voc_superpixels --out data/
  python scripts/convert_lrgb.py --dataset voc_superpixels \
      --voc-dir extracted_dir_with_train_val_test_pickles --out data/

Without --csv/--split the script downloads the official LRGB files from
the same Dropbox URLs the reference uses and verifies the same md5 sums
(reference loader/dataset/constants.py:1-17, peptides_functional.py:63-75).
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


# Official LRGB sources + checksums.  The peptides rows are identical to
# the reference's loader/dataset/constants.py:1-17; the VOC row comes from
# the LRGB benchmark repository (the reference has no VOC loader — its
# node-level branch raises NotImplementedError, loader.py:108), md5 is not
# published there so verification is skipped for it.
SOURCES = {
    "peptides_func": {
        "csv_url": "https://www.dropbox.com/s/ol2v01usvaxbsr8/"
                   "peptide_multi_class_dataset.csv.gz?dl=1",
        "csv_md5": "701eb743e899f4d793f0e13c8fa5a1b4",
        "csv_name": "peptide_multi_class_dataset.csv.gz",
        "split_url": "https://www.dropbox.com/s/j4zcnx2eipuo0xz/"
                     "splits_random_stratified_peptide.pickle?dl=1",
        "split_md5": "5a0114bdadc80b94fc7ae974f13ef061",
        "split_name": "splits_random_stratified_peptide.pickle",
    },
    "peptides_struct": {
        "csv_url": "https://www.dropbox.com/s/464u3303eu2u4zp/"
                   "peptide_structure_dataset.csv.gz?dl=1",
        "csv_md5": "9786061a34298a0684150f2e4ff13f47",
        "csv_name": "peptide_structure_dataset.csv.gz",
        "split_url": "https://www.dropbox.com/s/9dfifzft1hqgow6/"
                     "splits_random_stratified_peptide_structure.pickle?dl=1",
        # Identical to peptides_func's split md5 — verbatim from the
        # reference (constants.py:4 vs :12 carry the same value); if the
        # upstream hash is wrong, pass --split to skip the check.
        "split_md5": "5a0114bdadc80b94fc7ae974f13ef061",
        "split_name": "splits_random_stratified_peptide_structure.pickle",
    },
    "voc_superpixels": {
        # LRGB repo, rag-boundary graphs with edge weights ("edge_wt_
        # region_boundary" variant, the LRGB paper's default for GNNs).
        "zip_url": "https://www.dropbox.com/s/6pfz2mccfbkj7r3/"
                   "voc_superpixels_edge_wt_region_boundary.zip?dl=1",
        "zip_md5": None,   # not published; download is best-effort
        "zip_name": "voc_superpixels_edge_wt_region_boundary.zip",
    },
}

TARGET_NAMES = [
    "Inertia_mass_a", "Inertia_mass_b", "Inertia_mass_c",
    "Inertia_valence_a", "Inertia_valence_b", "Inertia_valence_c",
    "length_a", "length_b", "length_c", "Spherocity", "Plane_best_fit",
]

VOC_NUM_CLASSES = 21


def _fetch(url: str, dest: Path, md5: str | None) -> Path:
    """Download with md5 verification (reference
    peptides_functional.py:63-75 semantics: reject on mismatch)."""
    import hashlib
    import urllib.request

    if not dest.exists():
        print(f"downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, dest)  # noqa: S310
    if md5 is None:
        print(f"warning: no published md5 for {dest.name}; skipping check")
        return dest
    digest = hashlib.md5(dest.read_bytes()).hexdigest()  # noqa: S324
    if digest != md5:
        dest.unlink()
        raise RuntimeError(f"md5 mismatch for {dest}: {digest} != {md5}")
    return dest


def convert_peptides(dataset: str, csv_path, split_path, out_dir,
                     smiles2graph_fn=None):
    """CSV + split pickle -> <out_dir>/<dataset>.npz (schema in
    graph_hscn_tpu/data/lrgb.py).  ``smiles2graph_fn`` is injectable so
    the conversion logic is testable without RDKit; the default is
    ``ogb.utils.smiles2graph``, exactly what the reference calls
    (peptides_functional.py:85-100)."""
    import pandas as pd

    if smiles2graph_fn is None:
        from ogb.utils import smiles2graph as smiles2graph_fn  # needs rdkit

    df = pd.read_csv(csv_path)
    node_feats, edge_feats, edge_indices = [], [], []
    node_ptr, edge_ptr = [0], [0]
    ys = []
    for i in range(len(df)):
        g = smiles2graph_fn(df["smiles"].iloc[i])
        node_feats.append(g["node_feat"])
        edge_feats.append(g["edge_feat"])
        edge_indices.append(g["edge_index"] + node_ptr[-1])
        node_ptr.append(node_ptr[-1] + g["num_nodes"])
        edge_ptr.append(edge_ptr[-1] + g["edge_index"].shape[1])
        if dataset == "peptides_func":
            ys.append(eval(df["labels"].iloc[i]))  # noqa: S307 (ref parity)
        else:
            ys.append(df[TARGET_NAMES].iloc[i].values)

    y = np.asarray(ys, np.float32)
    if dataset == "peptides_struct":
        # Per-column z-score, reference peptides_structural.py:83-86.
        y = (y - np.nanmean(y, 0)) / np.nanstd(y, 0)

    with open(split_path, "rb") as f:
        splits = pickle.load(f)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{dataset}.npz"
    np.savez_compressed(
        path,
        node_feat=np.concatenate(node_feats).astype(np.int16),
        edge_feat=np.concatenate(edge_feats).astype(np.int16),
        edge_index=np.concatenate(edge_indices, axis=1).astype(np.int32),
        node_ptr=np.asarray(node_ptr, np.int64),
        edge_ptr=np.asarray(edge_ptr, np.int64),
        y=y,
        split_train=np.asarray(splits["train"]),
        split_val=np.asarray(splits["val"]),
        split_test=np.asarray(splits["test"]),
    )
    print(f"wrote {path}")
    return path


def convert_voc(raw_dir, out_dir):
    """LRGB PascalVOC-SP pickles -> <out_dir>/voc_superpixels.npz.

    ``raw_dir`` holds {train,val,test}.pickle, each a list of graphs
    ``(x [n,14] float, edge_attr [e,1|2] float, edge_index [2,e] long,
    y [n] long)`` — the LRGB repo's VOCSuperpixels raw format (tensors
    unpickle via torch).  Node labels are stored as a flat int array plus
    ``num_node_classes``; the loader one-hots them.  Splits become index
    ranges over the concatenated graph list (VOC ships pre-split — there
    is no split pickle)."""
    raw_dir = Path(raw_dir)
    node_feats, edge_feats, edge_indices, node_ys = [], [], [], []
    node_ptr, edge_ptr = [0], [0]
    split_idx = {}
    count = 0
    for split in ("train", "val", "test"):
        with open(raw_dir / f"{split}.pickle", "rb") as f:
            graphs = pickle.load(f)
        split_idx[split] = np.arange(count, count + len(graphs))
        count += len(graphs)
        for g in graphs:
            x, edge_attr, edge_index, y = (np.asarray(t) for t in g)
            node_feats.append(x.astype(np.float32))
            edge_feats.append(edge_attr.astype(np.float32))
            edge_indices.append(edge_index.astype(np.int64) + node_ptr[-1])
            node_ys.append(y.astype(np.int16))
            node_ptr.append(node_ptr[-1] + x.shape[0])
            edge_ptr.append(edge_ptr[-1] + edge_index.shape[1])

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / "voc_superpixels.npz"
    np.savez_compressed(
        path,
        node_feat=np.concatenate(node_feats).astype(np.float32),
        edge_feat=np.concatenate(edge_feats).astype(np.float32),
        edge_index=np.concatenate(edge_indices, axis=1).astype(np.int32),
        node_ptr=np.asarray(node_ptr, np.int64),
        edge_ptr=np.asarray(edge_ptr, np.int64),
        node_y=np.concatenate(node_ys).astype(np.int16),
        num_node_classes=np.asarray(VOC_NUM_CLASSES, np.int32),
        split_train=split_idx["train"].astype(np.int64),
        split_val=split_idx["val"].astype(np.int64),
        split_test=split_idx["test"].astype(np.int64),
    )
    print(f"wrote {path}")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    choices=["peptides_func", "peptides_struct",
                             "voc_superpixels"])
    ap.add_argument("--csv", default=None,
                    help="pre-downloaded CSV (default: fetch from the "
                         "official Dropbox URL and verify md5)")
    ap.add_argument("--split", default=None,
                    help="pre-downloaded split pickle (default: fetch)")
    ap.add_argument("--voc-dir", default=None,
                    help="extracted VOC pickle dir with "
                         "{train,val,test}.pickle (default: fetch + unzip)")
    ap.add_argument("--out", default="data")
    args = ap.parse_args()

    src = SOURCES[args.dataset]
    raw = Path(args.out) / "raw"
    raw.mkdir(parents=True, exist_ok=True)

    if args.dataset == "voc_superpixels":
        if args.voc_dir is None:
            import zipfile
            z = _fetch(src["zip_url"], raw / src["zip_name"],
                       src["zip_md5"])
            with zipfile.ZipFile(z) as zf:
                zf.extractall(raw)
            # The official zip nests the pickles one directory deep.
            (candidate,) = [p.parent for p in raw.rglob("train.pickle")]
            args.voc_dir = candidate
        convert_voc(args.voc_dir, args.out)
        return

    if args.csv is None:
        args.csv = _fetch(src["csv_url"], raw / src["csv_name"],
                          src["csv_md5"])
    if args.split is None:
        args.split = _fetch(src["split_url"], raw / src["split_name"],
                            src["split_md5"])
    convert_peptides(args.dataset, args.csv, args.split, args.out)


if __name__ == "__main__":
    main()
