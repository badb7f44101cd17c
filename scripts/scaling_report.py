#!/usr/bin/env python
"""Data-parallel scaling-efficiency report (BASELINE.json: edges/s at 1
chip / 1 host / N hosts).

Only one physical TPU chip is reachable in this environment, so the
multi-device curve is measured on an emulated CPU mesh
(--xla_force_host_platform_device_count); the DP program is the same
shard_map+psum code that runs on a real slice, so the COMM/compute
structure is what's being validated.  Writes JSON to stdout:
  {"devices": [1, 2, 4, 8], "edges_per_sec": [...], "efficiency": [...]}

Usage: python scripts/scaling_report.py [--devices 8] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--graphs-per-device", type=int, default=8)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    except RuntimeError:
        pass
    import numpy as np
    import optax

    from graph_hscn_tpu.config.config import MPNNConfig
    from graph_hscn_tpu.data.batching import PadBudget
    from graph_hscn_tpu.data.synthetic import make_peptides_func
    from graph_hscn_tpu.models.mpnn import build_mpnn
    from graph_hscn_tpu.parallel.data_parallel import (make_dp_train_step,
                                                       pack_for_devices,
                                                       shard_stacked_batch)
    from graph_hscn_tpu.parallel.mesh import make_mesh
    from graph_hscn_tpu.train.loop import init_state

    model = build_mpnn(MPNNConfig(conv_type="gcn", activation="relu",
                                  hidden_channels=64, num_layers=4,
                                  dropout=0.0), 9, 10)
    tx = optax.adamw(1e-3)

    results = {"devices": [], "edges_per_sec": [], "efficiency": []}
    base_eps = None
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= args.devices]
    for nd in sizes:
        mesh = make_mesh(("data",), (nd,), devices=jax.devices()[:nd])
        graphs = make_peptides_func(
            num_graphs=args.graphs_per_device * nd, seed=0, mean_nodes=100)
        budget = PadBudget.for_dataset(graphs, args.graphs_per_device)
        stacked = pack_for_devices(graphs, nd, budget)
        E = int(stacked.edge_mask.sum())
        example = jax.tree_util.tree_map(lambda x: x[0], stacked)
        state = init_state(model, tx, example, seed=0)
        step = make_dp_train_step(model, tx, "cross_entropy", mesh)
        sharded = shard_stacked_batch(stacked, mesh)
        state, loss, *_ = step(state, sharded)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss, *_ = step(state, sharded)
        float(loss)
        dt = (time.perf_counter() - t0) / args.steps
        eps = E / dt
        if base_eps is None:
            base_eps = eps
        eff = eps / (base_eps * nd)
        results["devices"].append(nd)
        results["edges_per_sec"].append(round(eps, 1))
        results["efficiency"].append(round(eff, 3))
        print(f"devices={nd}: {eps / 1e6:.2f} M edges/s, "
              f"efficiency={eff:.2%}", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
