"""Convert a framework .npz cache (scripts/export_synthetic_npz.py output)
into the reference's on-disk dataset layout so the reference's
InMemoryDataset constructor finds a processed cache and never runs its
download()/process() phases (peptides_functional.py:38-46,63-106).

Seeds, inside the reference run dir passed as --ref-root:

  datasets/<folder>/processed/geometric_data_processed.pt
      torch.save((data, slices)) in the shim collate layout
  datasets/<folder>/<version-md5>
      release tag touched so the interactive staleness prompt
      (peptides_functional.py:38-44) never fires
  datasets/<folder>/<split pickle>
      {"train","val","test"} numpy index arrays, the format
      get_idx_split unpickles (peptides_functional.py:108-115)

Must run with scripts/ref_shim on PYTHONPATH (it imports the shim's
torch_geometric.data.collate to write the exact layout the shim
InMemoryDataset reads back).
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np
import torch

from torch_geometric.data import Data, collate  # shim

# Mirrors /root/reference/graph_hscn/loader/dataset/constants.py.
LAYOUT = {
    "peptides_func": {
        "folder": "peptides_functional",
        "version": "701eb743e899f4d793f0e13c8fa5a1b4",
        "split_pickle": "splits_random_stratified_peptide.pickle",
    },
    "peptides_struct": {
        "folder": "peptides_structural",
        "version": "9786061a34298a0684150f2e4ff13f47",
        "split_pickle": "splits_random_stratified_peptide_structure.pickle",
    },
}


def seed(npz_path: Path, dataset: str, ref_root: Path) -> None:
    z = np.load(npz_path)
    node_ptr, edge_ptr = z["node_ptr"], z["edge_ptr"]
    num_graphs = len(node_ptr) - 1
    data_list = []
    for i in range(num_graphs):
        n0, n1 = int(node_ptr[i]), int(node_ptr[i + 1])
        e0, e1 = int(edge_ptr[i]), int(edge_ptr[i + 1])
        data_list.append(Data(
            x=torch.from_numpy(z["node_feat"][n0:n1]).float(),
            edge_index=torch.from_numpy(
                z["edge_index"][:, e0:e1] - n0).long(),
            edge_attr=torch.from_numpy(z["edge_feat"][e0:e1]).float(),
            y=torch.from_numpy(z["y"][i:i + 1]).float(),
        ))
    layout = LAYOUT[dataset]
    folder = ref_root / "datasets" / layout["folder"]
    (folder / "processed").mkdir(parents=True, exist_ok=True)
    (folder / "raw").mkdir(parents=True, exist_ok=True)
    torch.save(collate(data_list),
               folder / "processed" / "geometric_data_processed.pt")
    (folder / layout["version"]).touch()
    splits = {k: z[f"split_{k}"].astype(np.int64)
              for k in ("train", "val", "test")}
    with open(folder / layout["split_pickle"], "wb") as f:
        pickle.dump(splits, f)
    print(f"seeded {num_graphs} graphs -> {folder}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--dataset", default="peptides_func")
    ap.add_argument("--ref-root", required=True,
                    help="the (writable) copy of the reference repo")
    args = ap.parse_args()
    seed(Path(args.npz), args.dataset, Path(args.ref_root))


if __name__ == "__main__":
    main()
