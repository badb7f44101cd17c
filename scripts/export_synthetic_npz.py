"""Export the synthetic generator's graphs to the framework's .npz cache
format (data/lrgb.py layout) so BOTH sides of a parity run train on
byte-identical data: the framework loads the cache via ``data.data_dir``,
and scripts/ref_shim/seed_reference_data.py converts the same file into
the reference's processed-dataset layout (peptides_functional.py:45-46).

Usage:
    python scripts/export_synthetic_npz.py --dataset peptides_func \
        --num-graphs 512 --out /tmp/parity_data
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graph_hscn_tpu.data import synthetic  # noqa: E402


def export(dataset: str, num_graphs: int, seed: int, out_dir: Path) -> Path:
    if dataset == "peptides_func":
        graphs = synthetic.make_peptides_func(num_graphs, seed=seed)
    elif dataset == "peptides_struct":
        graphs = synthetic.make_peptides_struct(num_graphs, seed=seed)
    else:
        raise SystemExit(f"unsupported dataset for export: {dataset}")
    split = synthetic.split_indices(num_graphs)

    node_feat, edge_index, edge_feat, ys = [], [], [], []
    node_ptr, edge_ptr = [0], [0]
    offset = 0
    for g in graphs:
        node_feat.append(g.x)
        edge_index.append(g.edge_index + offset)
        edge_feat.append(g.edge_attr)
        ys.append(g.y)
        offset += g.num_nodes
        node_ptr.append(offset)
        edge_ptr.append(edge_ptr[-1] + g.num_edges)

    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{dataset}.npz"
    np.savez_compressed(
        path,
        node_feat=np.concatenate(node_feat, axis=0),
        edge_index=np.concatenate(edge_index, axis=1),
        edge_feat=np.concatenate(edge_feat, axis=0),
        node_ptr=np.asarray(node_ptr, dtype=np.int64),
        edge_ptr=np.asarray(edge_ptr, dtype=np.int64),
        y=np.stack(ys).astype(np.float32),
        split_train=split["train"],
        split_val=split["val"],
        split_test=split["test"],
    )
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="peptides_func")
    ap.add_argument("--num-graphs", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    path = export(args.dataset, args.num_graphs, args.seed, Path(args.out))
    print(path)


if __name__ == "__main__":
    main()
