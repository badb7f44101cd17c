#!/usr/bin/env python
"""Multi-chip scaling report (BASELINE.json: >=80% efficiency 1 -> N).

Two sections:

--mode comm (default; deterministic — the part computable on the virtual
mesh today, SCALING.md is generated from it):
  per-layer communication volume of the edge-partitioned path for
  peptides- and VOC-scale workloads — v1 all-gather (N*F per device) vs
  targeted halo all_to_all (D*H*F), with and without the Cuthill-McKee
  locality reorder — plus a 1-vs-N numerical-equality check of the
  sharded GCN forward/grads against the single-device stack.

--mode dp:
  wall-clock DP scaling curve on the emulated CPU mesh
  (--xla_force_host_platform_device_count).  Only one physical TPU chip
  is reachable here, so the timing curve is indicative only (host core
  oversubscription); the DP program is the same shard_map+psum code that
  runs on a real slice.  Writes JSON to stdout:
  {"devices": [1, 2, 4, 8], "edges_per_sec": [...], "efficiency": [...]}

Usage: python scripts/scaling_report.py [--mode comm|dp] [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _giant_grid_graph(side: int):
    """One side x side 4-neighbor grid graph (VOC-superpixel topology at
    giant-graph scale; the synthetic generator caps per-graph size)."""
    import numpy as np

    from graph_hscn_tpu.data.batching import GraphData
    n = side * side
    ids = np.arange(n).reshape(side, side)
    right = np.stack([ids[:, :-1].ravel(), ids[:, 1:].ravel()])
    down = np.stack([ids[:-1, :].ravel(), ids[1:, :].ravel()])
    ei = np.concatenate([right, down, right[::-1], down[::-1]], axis=1)
    rng = np.random.default_rng(42)
    x = rng.normal(size=(n, 14)).astype(np.float32)
    node_y = np.zeros((n, 21), np.float32)
    node_y[np.arange(n), rng.integers(0, 21, size=n)] = 1.0
    return GraphData(x=x, edge_index=ei.astype(np.int64), edge_attr=None,
                     y=None, node_y=node_y)


def comm_report(num_devices: int, feat: int = 128):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", num_devices)
    except RuntimeError:
        pass
    import numpy as np

    from graph_hscn_tpu.data.batching import PadBudget, pack_batch
    from graph_hscn_tpu.data.synthetic import (make_peptides_func,
                                               make_voc_superpixels)
    from graph_hscn_tpu.models.layers import GCNConv
    from graph_hscn_tpu.parallel.edge_partition import (apply_node_reorder,
                                                        locality_reorder,
                                                        plan_halo_exchange)
    from graph_hscn_tpu.parallel.mesh import make_mesh
    from graph_hscn_tpu.parallel.sharded_gcn import (
        init_sharded_gcn_params, make_sharded_gcn, shard_node_blocks)

    D = num_devices
    workloads = {
        "peptides": make_peptides_func(num_graphs=64, seed=0,
                                       mean_nodes=150),
        "voc": make_voc_superpixels(num_graphs=16, seed=0,
                                    mean_nodes=480),
        # The regime the CM reorder exists for: one giant graph whose node
        # ids carry no locality (packed batches of small graphs are
        # already block-local by construction).
        "giant_shuffled": [_giant_grid_graph(side=96)],
    }
    rows = []
    for name, graphs in workloads.items():
        budget = PadBudget.for_dataset(graphs, batch_size=len(graphs),
                                       node_multiple=D * 8)
        b = pack_batch(graphs, budget)
        n = b.num_nodes_padded
        snd, rcv = np.asarray(b.senders), np.asarray(b.receivers)
        em = np.asarray(b.edge_mask)
        nm = np.asarray(b.node_mask)
        if name == "giant_shuffled":
            shuf = np.random.default_rng(0).permutation(n)
            snd, rcv, nm = apply_node_reorder(shuf, snd, rcv, nm)

        def halo_stats(s, r):
            plan = plan_halo_exchange(s, r, em, n, D)
            e_loc = int(plan["mask_loc"].sum())
            e_hal = int(plan["mask_hal"].sum())
            return plan["halo_width"], e_loc, e_hal

        h0, el0, eh0 = halo_stats(snd, rcv)
        perm = locality_reorder(snd, rcv, em, n, node_mask=nm)
        s2, r2, _ = apply_node_reorder(perm, snd, rcv, nm)
        h1, el1, eh1 = halo_stats(s2, r2)
        rows.append({
            "workload": name, "nodes": n,
            "edges": int(em.sum()), "devices": D, "feat": feat,
            "allgather_floats_per_dev_layer": n * feat,
            "halo_floats_unordered": D * int(h0) * feat,
            "halo_floats_cm": D * int(h1) * feat,
            "halo_width_unordered": int(h0),
            "halo_width_cm": int(h1),
            "halo_edge_frac_unordered": eh0 / max(el0 + eh0, 1),
            "halo_edge_frac_cm": eh1 / max(el1 + eh1, 1),
            "reduction_vs_allgather":
                n * feat / max(D * int(h1) * feat, 1),
        })

    # Hybrid 2-D (DP groups x edge partition) vs flat D-way partition:
    # per-device all_to_all payload per layer.  Graphs are disjoint, so
    # the halo is within-graph either way; the hybrid keeps each exchange
    # inside a Dep-device row — the collective buffer shrinks from
    # D*H_flat*F to Dep*H_hyb*F and spans fewer devices.
    from graph_hscn_tpu.parallel.hybrid import build_hybrid_split
    hybrid_rows = []
    for name in ("peptides", "voc"):
        graphs = workloads[name]
        budget = PadBudget.for_dataset(graphs, batch_size=len(graphs),
                                       node_multiple=D * 8)
        b = pack_batch(graphs, budget)
        n = b.num_nodes_padded
        snd, rcv = np.asarray(b.senders), np.asarray(b.receivers)
        em = np.asarray(b.edge_mask)
        nm = np.asarray(b.node_mask)
        perm = locality_reorder(snd, rcv, em, n, node_mask=nm)
        s2, r2, _ = apply_node_reorder(perm, snd, rcv, nm)
        flat = plan_halo_exchange(s2, r2, em, n, D)
        for d_dp in (2, 4):
            d_ep = D // d_dp
            _, _, _, _, meta = build_hybrid_split(graphs, d_dp, d_ep)
            hybrid_rows.append({
                "workload": name, "mesh": f"{d_dp}x{d_ep}",
                "flat_halo_floats_per_dev_layer":
                    D * int(flat["halo_width"]) * feat,
                "hybrid_halo_floats_per_dev_layer":
                    d_ep * int(meta["halo_width"]) * feat,
                "collective_span_flat": D,
                "collective_span_hybrid": d_ep,
                "payload_reduction": (D * int(flat["halo_width"]))
                    / max(d_ep * int(meta["halo_width"]), 1),
            })

    # 1-vs-N numerical equality: sharded GCN forward on the D-device mesh
    # vs the single-device GCNConv stack, on the VOC workload.
    graphs = workloads["voc"]
    budget = PadBudget.for_dataset(graphs, batch_size=len(graphs),
                                   node_multiple=D * 8)
    b = pack_batch(graphs, budget)
    n = b.num_nodes_padded
    plan_np = plan_halo_exchange(np.asarray(b.senders),
                                 np.asarray(b.receivers),
                                 np.asarray(b.edge_mask), n, D)
    import jax.numpy as jnp
    mesh = make_mesh(("data",), (D,))
    dims = [graphs[0].x.shape[1], 32, 21]
    params = init_sharded_gcn_params(jax.random.PRNGKey(0), dims)
    forward, _ = make_sharded_gcn(mesh, num_layers=2)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if k not in ("block_size", "halo_width")}
    (xb,) = shard_node_blocks(mesh, D, np.asarray(b.node_feat))
    out = np.asarray(forward(params, xb, plan)).reshape(n, -1)

    x = b.node_feat
    for i, layer in enumerate(params):
        conv = GCNConv(features=layer["kernel"].shape[1])
        x = conv.apply({"params": {"kernel": layer["kernel"],
                                   "bias": layer["bias"]}},
                       x, b.senders, b.receivers, b.edge_mask, num_nodes=n)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    ref = np.asarray(x)
    mask = np.asarray(b.node_mask)
    max_abs = float(np.abs(out[mask] - ref[mask]).max())
    denom = float(np.abs(ref[mask]).max())
    equality = {"max_abs_diff": max_abs, "max_rel_diff": max_abs / denom,
                "devices": D}
    return {"comm": rows, "hybrid": hybrid_rows,
            "equality_1_vs_N": equality}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["comm", "dp"], default="comm")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--graphs-per-device", type=int, default=8)
    args = ap.parse_args()

    if args.mode == "comm":
        print(json.dumps(comm_report(args.devices), indent=1))
        return

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
