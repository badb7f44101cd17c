"""Giant-graph single-chip SpMM: HBM-streamed Pallas kernel vs XLA.

The regime this measures: ONE graph too large for the dense-block path and
for a VMEM-resident feature matrix (x > VMEM_X_BUDGET), trained on a single
chip — the reference has no analog (it is molecular-scale only; its
node-level branch raises NotImplementedError, loader/loader.py:108).

Pipeline under test (all shipped components):
  1. RCM locality reorder (parallel/edge_partition.locality_reorder) —
     bounds the index bandwidth, which is what makes the windowed plan
     (ops/pallas/spmm_kernel.spmm_plan, <=1024-node spans per edge tile)
     feasible for a giant graph at all.
  2. Receiver-sorted edges -> SpmmPlanArrays.
  3. gather_scatter routes by size: x <= 6MB -> VMEM kernel,
     <= 12MB -> HBM-streamed double-buffered kernel, else XLA.

Run on the TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/giant_graph_bench.py
On CPU it validates plan feasibility + routing and runs a small
interpret-mode correctness check instead of timing.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def grid_graph(n_target: int, seed: int = 0):
    """4-neighborhood lattice (superpixel-like locality) with n~n_target."""
    side = int(np.ceil(np.sqrt(n_target)))
    n = side * side
    idx = np.arange(n).reshape(side, side)
    src, dst = [], []
    right = (idx[:, :-1].ravel(), idx[:, 1:].ravel())
    down = (idx[:-1, :].ravel(), idx[1:, :].ravel())
    for a, b in (right, down):
        src += [a, b]
        dst += [b, a]
    senders = np.concatenate(src).astype(np.int32)
    receivers = np.concatenate(dst).astype(np.int32)
    return n, senders, receivers


def build(n_target=20_000, feat=128):
    from graph_hscn_tpu.ops.pallas.spmm_kernel import (VMEM_X_BUDGET,
                                                       spmm_plan_auto)
    from graph_hscn_tpu.parallel.edge_partition import (apply_node_reorder,
                                                        locality_reorder)

    n, snd, rcv = grid_graph(n_target)
    e = snd.shape[0]
    mask = np.ones(e, bool)
    perm = locality_reorder(snd, rcv, mask, n)
    snd, rcv = apply_node_reorder(perm, snd, rcv)
    order = np.argsort(rcv, kind="stable")
    snd, rcv = snd[order], rcv[order]
    # Pad edges to a lane multiple like the batcher does.
    pad = (-e) % 128
    snd = np.concatenate([snd, np.zeros(pad, np.int32)])
    rcv = np.concatenate([rcv, np.zeros(pad, np.int32)])
    mask = np.concatenate([mask, np.zeros(pad, bool)])
    # Auto-select the cheapest feasible (tile, window) pair — the RCM
    # bandwidth of the lattice decides which windows are feasible, and
    # the exact-boundary rejection (rel == window) can rule out a pair
    # that a pre-round-3 plan would have silently mis-executed.
    plan = spmm_plan_auto(snd, rcv, mask, n)
    xbytes = n * feat * 4
    log(f"giant graph: N={n}, E={e} (+{pad} pad), F={feat}, "
        f"x={xbytes / 2 ** 20:.1f} MiB "
        f"(VMEM budget {VMEM_X_BUDGET / 2 ** 20:.0f} MiB -> "
        f"{'HBM-streamed kernel' if xbytes > VMEM_X_BUDGET else 'VMEM kernel'})")
    assert plan is not None, "RCM-ordered grid graph must be plan-feasible"
    assert xbytes > VMEM_X_BUDGET, "workload must exceed the VMEM budget"
    return n, e, snd, rcv, mask, plan


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from graph_hscn_tpu.utils.profiling import enable_compile_cache
        enable_compile_cache()
    feat = 128
    n, e, snd, rcv, mask, plan = build(feat=feat)

    from graph_hscn_tpu.ops import spmm as spmm_mod
    from graph_hscn_tpu.ops.spmm import gather_scatter

    plan_dev = jax.tree_util.tree_map(jnp.asarray, plan)
    snd_d, rcv_d = jnp.asarray(snd), jnp.asarray(rcv)
    # Padding edges are (0,0) placeholders; a zero edge weight neutralizes
    # them on the XLA path exactly like the plan's masked rows do in the
    # kernel (the batcher instead points padding at dummy nodes).
    w_d = jnp.asarray(mask, jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (n, feat), jnp.float32)

    def make_fwd_bwd(use_plan):
        def fwd_bwd(x):
            y, vjp = jax.vjp(
                lambda x: gather_scatter(
                    x, snd_d, rcv_d, num_nodes=n, edge_weight=w_d,
                    plan=plan_dev if use_plan else None), x)
            (dx,) = vjp(y)
            return dx
        return fwd_bwd

    if not on_tpu:
        # Interpret-mode correctness at reduced size, then routing check.
        spmm_mod.set_backend("pallas")
        y_hbm = make_fwd_bwd(True)(x0)
        spmm_mod.set_backend("xla")
        y_xla = make_fwd_bwd(False)(x0)
        np.testing.assert_allclose(np.asarray(y_hbm), np.asarray(y_xla),
                                   rtol=2e-4, atol=2e-4)
        log("CPU interpret-mode check: HBM-kernel fwd+bwd matches XLA")
        return

    def timed(label, fn, x):
        # Marginal per-iteration time (two trip counts of one compiled
        # dynamic-trip fori_loop program): the relay's fixed per-call
        # cost (~25 ms under load) otherwise dominates short chains —
        # bench.scan_bench documents the measurement.
        import bench
        dt = bench.scan_bench(fn, x, (), iters=120)
        log(f"{label}: {dt * 1e6:8.1f} us fwd+bwd -> "
            f"{e / dt / 1e6:7.2f} M edges/s")
        return dt

    spmm_mod.set_backend("pallas")
    dt_hbm = timed("pallas HBM-streamed", make_fwd_bwd(True), x0)
    spmm_mod.set_backend("xla")
    dt_xla = timed("XLA gather+segsum  ", make_fwd_bwd(False), x0)
    log(f"speedup: {dt_xla / dt_hbm:.2f}x")


if __name__ == "__main__":
    main()
