"""Benchmark harness.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): SpMM fwd+bwd edges/sec/chip on a
peptides-like workload (32 graphs, ~150 nodes each, F=128).  The baseline
is the reference's compute path — torch CPU gather + index_add (exactly what
PyG's MessagePassing lowers to on CPU; torch_geometric itself is not
installed in this image).  Target: >= 5x the CPU baseline.

Measurement notes for this rig: per-call dispatch through the axon relay
costs ~300us and ``block_until_ready`` can return before execution
completes, so every timing (a) runs K iterations chained inside ONE jitted
``lax.scan`` program and (b) forces completion with a scalar readback.

Two TPU execution paths are timed; the headline is the better one:
  sparse : gather + sorted segment-sum on the flat CSR arrays
  dense  : per-graph dense-block batched matmul (MXU path; the natural
           formulation for molecular-scale graphs)
Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def with_deadline(fn, seconds: int, label: str):
    """Run fn() with a SIGALRM watchdog: the remote-compile service this
    session depends on sometimes wedges, and the bench must always emit
    its JSON line.  Returns fn() or None on timeout."""
    import signal

    class _Timeout(Exception):
        pass

    def _raise(*_):
        raise _Timeout()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn()
    except _Timeout:
        log(f"{label}: timed out after {seconds}s (compile service wedged?)"
            " — skipped")
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def build_workload(num_graphs=32, mean_nodes=150, feat=128, seed=0):
    from graph_hscn_tpu.data.batching import PadBudget, pack_batch, to_dense
    from graph_hscn_tpu.data.synthetic import make_peptides_func

    graphs = make_peptides_func(num_graphs=num_graphs, seed=seed,
                                mean_nodes=mean_nodes)
    budget = PadBudget.for_dataset(graphs, batch_size=num_graphs)
    batch = pack_batch(graphs, budget)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(budget.num_nodes, feat)).astype(np.float32)
    real_edges = int(batch.edge_mask.sum())
    n_max = max(g.num_nodes for g in graphs)
    dense = to_dense(batch, n_max)
    return batch, dense, x, real_edges


def scan_bench(step_fn, x0, args, iters=30, reps=5):
    """Per-iteration time of ``step_fn`` chained inside one jit+scan program
    with forced completion via scalar readback."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *a):
        def body(h, _):
            return step_fn(h, *a), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(h)

    float(run(x0, *args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x0, *args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_sparse(batch, x):
    import jax
    import jax.numpy as jnp

    from graph_hscn_tpu.ops.spmm import gather_scatter

    snd = jnp.asarray(batch.senders)
    rcv = jnp.asarray(batch.receivers)
    n = x.shape[0]

    def fwd_bwd(x, snd, rcv):
        y, vjp = jax.vjp(
            lambda x: gather_scatter(x, snd, rcv, num_nodes=n), x)
        (dx,) = vjp(y)
        return dx

    return scan_bench(fwd_bwd, jnp.asarray(x), (snd, rcv))


def bench_dense(dense, x_feat_dim, dtype=None):
    import jax
    import jax.numpy as jnp

    G, n_max, _ = dense.adj.shape
    n_pad = ((n_max + 127) // 128) * 128
    adj = np.zeros((G, n_pad, n_pad), np.float32)
    adj[:, :n_max, :n_max] = dense.adj
    adj = jnp.asarray(adj)
    x0 = jnp.asarray(np.random.default_rng(1).normal(
        size=(G, n_pad, x_feat_dim)).astype(np.float32))
    if dtype is not None:
        adj = adj.astype(dtype)
        x0 = x0.astype(dtype)

    def fwd_bwd(x, adj):
        y, vjp = jax.vjp(lambda x: jnp.matmul(adj, x), x)
        (dx,) = vjp(y)
        return dx

    return scan_bench(fwd_bwd, x0, (adj,))


def bench_torch_cpu(batch, x, iters=20, warmup=3):
    """Reference-path baseline: torch CPU gather + index_add fwd+bwd (the
    kernel PyG's GCNConv propagate executes on CPU)."""
    import torch

    senders = torch.from_numpy(np.asarray(batch.senders)).long()
    receivers = torch.from_numpy(np.asarray(batch.receivers)).long()
    xt = torch.from_numpy(np.asarray(x))
    n = xt.shape[0]

    def fwd_bwd():
        xv = xt.clone().requires_grad_(True)
        msgs = xv.index_select(0, senders)
        out = torch.zeros(n, xv.shape[1]).index_add_(0, receivers, msgs)
        out.backward(out.detach())
        return xv.grad

    for _ in range(warmup):
        fwd_bwd()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fwd_bwd()
        best = min(best, time.perf_counter() - t0)
    return best  # min, symmetric with scan_bench's aggregation


def bench_model_step(steps: int = 3):
    """Model-level diagnostic: 5-layer GCN h128 train step throughput via
    the device-resident epoch-as-a-program path (stderr only)."""
    import jax
    import jax.numpy as jnp

    from graph_hscn_tpu.config.config import DataConfig, MPNNConfig
    from graph_hscn_tpu.data.pipeline import DataModule
    from graph_hscn_tpu.models.mpnn import build_mpnn
    from graph_hscn_tpu.train.device_data import (DeviceDataset, assemble,
                                                  epoch_permutation,
                                                  make_epoch_fn)
    from graph_hscn_tpu.train.loop import init_state
    from graph_hscn_tpu.train.optimizers import build_optimizer

    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=32, num_graphs=256))
    model = build_mpnn(MPNNConfig(conv_type="gcn", activation="relu",
                                  hidden_channels=128, num_layers=5,
                                  dropout=0.1), dm.num_features,
                       dm.num_classes)
    tx = build_optimizer("adamW", 1e-3, 5e-4)
    graphs = dm.split("train")
    ds = DeviceDataset.build(graphs)
    perm = epoch_permutation(len(graphs), 32, 0)
    tr_fn, _ = make_epoch_fn(model, tx, "cross_entropy")
    example = jax.jit(assemble)(ds, jnp.asarray(perm[0]))
    state = init_state(model, tx, example, seed=0)
    state, outs = tr_fn(state, ds, jnp.asarray(perm))
    float(jnp.sum(outs[0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, outs = tr_fn(state, ds, jnp.asarray(perm))
    float(jnp.sum(outs[0]))
    dt = (time.perf_counter() - t0) / steps
    nb = perm.shape[0]
    e_total = sum(g.num_edges for g in graphs)
    log(f"model train step (GCN-5 h128, device-resident): "
        f"{dt / nb * 1e3:.2f} ms/step, epoch {dt * 1e3:.1f} ms, "
        f"{e_total / dt / 1e6:.1f} M edges/s")


def main():
    import jax
    # Persistent compilation cache: the remote compile service this rig
    # depends on intermittently wedges for minutes; caching compiled
    # executables on disk makes reruns immune once a program has compiled
    # anywhere before.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # older jax / unsupported backend: best-effort
        log(f"compilation cache unavailable: {e}")
    backend = jax.default_backend()
    log(f"jax backend: {backend}, devices: {jax.devices()}")

    batch, dense, x, real_edges = build_workload()
    log(f"workload: N={x.shape[0]} nodes, E={batch.senders.shape[0]} edge "
        f"slots ({real_edges} real), F={x.shape[1]}, "
        f"n_max={dense.adj.shape[1]}")

    log("compiling+timing dense path...")
    dt_dense = with_deadline(lambda: bench_dense(dense, x.shape[1]),
                             240, "dense path")
    if dt_dense:
        log(f"dense-block fwd+bwd: {dt_dense * 1e6:.1f} us "
            f"-> {real_edges / dt_dense / 1e6:.1f} M edges/s")
    if dt_dense:
        # Mixed-precision diagnostic (stderr only; the headline stays f32
        # for a like-for-like comparison with the f32 torch baseline).
        import jax.numpy as jnp
        dt_bf16 = with_deadline(
            lambda: bench_dense(dense, x.shape[1], dtype=jnp.bfloat16),
            240, "dense bf16 path")
        if dt_bf16:
            log(f"dense-block bf16 fwd+bwd: {dt_bf16 * 1e6:.1f} us "
                f"-> {real_edges / dt_bf16 / 1e6:.1f} M edges/s "
                f"({dt_dense / dt_bf16:.2f}x vs f32)")
    log("compiling+timing sparse path...")
    dt_sparse = with_deadline(lambda: bench_sparse(batch, x),
                              240, "sparse path")
    if dt_sparse:
        log(f"sparse (gather+segsum) fwd+bwd: {dt_sparse * 1e6:.1f} us "
            f"-> {real_edges / dt_sparse / 1e6:.1f} M edges/s")

    if dt_dense is None:
        # The dense path is the usual headline winner; if its first
        # compile hit the service wedge, try once more now that other
        # programs have gotten through (the wedge is intermittent).
        log("retrying dense path once...")
        dt_dense = with_deadline(lambda: bench_dense(dense, x.shape[1]),
                                 240, "dense path retry")
        if dt_dense:
            log(f"dense-block fwd+bwd (retry): {dt_dense * 1e6:.1f} us "
                f"-> {real_edges / dt_dense / 1e6:.1f} M edges/s")

    candidates = [d for d in (dt_sparse, dt_dense) if d]
    if not candidates:
        print(json.dumps({"metric": "spmm_fwd_bwd_edges_per_sec_per_chip",
                          "value": float("nan"), "unit": "edges/s",
                          "vs_baseline": float("nan")}))
        return
    dt_best = min(candidates)
    eps = real_edges / dt_best

    try:
        dt_torch = bench_torch_cpu(batch, x)
        log(f"torch-cpu baseline fwd+bwd: {dt_torch * 1e6:.1f} us "
            f"-> {real_edges / dt_torch / 1e6:.2f} M edges/s")
        vs = dt_torch / dt_best
    except Exception as e:
        log(f"torch baseline failed: {e}")
        vs = float("nan")

    try:
        with_deadline(bench_model_step, 300, "model-step diagnostic")
    except Exception as e:
        log(f"model-step diagnostic failed: {e}")

    print(json.dumps({
        "metric": "spmm_fwd_bwd_edges_per_sec_per_chip",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
