#!/usr/bin/env python
"""Convert the original LRGB CSVs to the framework's .npz cache.

Run this on a machine WITH network access + RDKit + OGB installed (the
training environment has neither); copy the resulting
``<out>/<dataset>.npz`` next to the training job and set
``data.data_dir`` in the config.

The reference performs the same featurization inline
(peptides_functional.py:77-106: pandas CSV -> ogb.utils.smiles2graph per
row -> collate); here the output is the flat array schema documented in
graph_hscn_tpu/data/lrgb.py.

Usage (auto-download, like the reference's dataset class):
  python scripts/convert_lrgb.py --dataset peptides_func --out data/

or with pre-downloaded files:
  python scripts/convert_lrgb.py --dataset peptides_func --csv \
      peptide_multi_class_dataset.csv.gz --split \
      splits_random_stratified_peptide.pickle --out data/

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


# Official LRGB sources + checksums, identical to the reference's
# loader/dataset/constants.py:1-17.
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
}


def _fetch(url: str, dest: Path, md5: str) -> Path:
    """Download with md5 verification (reference
    peptides_functional.py:63-75 semantics: reject on mismatch)."""
    import hashlib
    import urllib.request

    if not dest.exists():
        print(f"downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, dest)  # noqa: S310
    digest = hashlib.md5(dest.read_bytes()).hexdigest()  # noqa: S324
    if digest != md5:
        dest.unlink()
        raise RuntimeError(f"md5 mismatch for {dest}: {digest} != {md5}")
    return dest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    choices=["peptides_func", "peptides_struct"])
    ap.add_argument("--csv", default=None,
                    help="pre-downloaded CSV (default: fetch from the "
                         "official Dropbox URL and verify md5)")
    ap.add_argument("--split", default=None,
                    help="pre-downloaded split pickle (default: fetch)")
    ap.add_argument("--out", default="data")
    args = ap.parse_args()

    import pandas as pd
    from ogb.utils import smiles2graph  # requires rdkit

    src = SOURCES[args.dataset]
    raw = Path(args.out) / "raw"
    raw.mkdir(parents=True, exist_ok=True)
    if args.csv is None:
        args.csv = _fetch(src["csv_url"], raw / src["csv_name"],
                          src["csv_md5"])
    if args.split is None:
        args.split = _fetch(src["split_url"], raw / src["split_name"],
                            src["split_md5"])

    df = pd.read_csv(args.csv)
    node_feats, edge_feats, edge_indices = [], [], []
    node_ptr, edge_ptr = [0], [0]
    ys = []
    for i in range(len(df)):
        g = smiles2graph(df["smiles"].iloc[i])
        node_feats.append(g["node_feat"])
        edge_feats.append(g["edge_feat"])
        edge_indices.append(g["edge_index"] + node_ptr[-1])
        node_ptr.append(node_ptr[-1] + g["num_nodes"])
        edge_ptr.append(edge_ptr[-1] + g["edge_index"].shape[1])
        if args.dataset == "peptides_func":
            ys.append(eval(df["labels"].iloc[i]))  # noqa: S307 (ref parity)
        else:
            ys.append(df[TARGET_NAMES].iloc[i].values)

    y = np.asarray(ys, np.float32)
    if args.dataset == "peptides_struct":
        # Per-column z-score, reference peptides_structural.py:83-86.
        y = (y - np.nanmean(y, 0)) / np.nanstd(y, 0)

    with open(args.split, "rb") as f:
        splits = pickle.load(f)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        out / f"{args.dataset}.npz",
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
    print(f"wrote {out / (args.dataset + '.npz')}")


TARGET_NAMES = [
    "Inertia_mass_a", "Inertia_mass_b", "Inertia_mass_c",
    "Inertia_valence_a", "Inertia_valence_b", "Inertia_valence_c",
    "length_a", "length_b", "length_c", "Spherocity", "Plane_best_fit",
]

if __name__ == "__main__":
    main()
