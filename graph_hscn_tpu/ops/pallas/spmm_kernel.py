"""Fused CSR SpMM Pallas kernel for TPU.

Computes  out[i] = sum_{e: recv[e]=i} w[e] * x[send[e]]  in ONE kernel —
no [E, F] message materialization in HBM and no XLA gather (which on TPU
runs row-at-a-time; measured 648us for 17k x 128 on this chip vs the
matmul formulation here).

Key idea — windowed one-hot MXU matmuls.  Edges are receiver-sorted and
batches are graph-contiguous, so every tile of TE consecutive edges touches
senders and receivers inside narrow node windows (bounded by the span of
the few graphs the tile overlaps).  Per edge tile t:

    gather :  msgs  = (w_t * G_t) @ x[ws_t : ws_t+WS]   G_t [TE, WS] one-hot
    scatter:  out[wr_t : wr_t+WR] += P_t^T @ msgs       P_t [TE, WR] one-hot

Both one-hots are built in-register from iota comparisons; the FLOPs are
"wasted" one-hot matmuls, but on the MXU they beat any per-row gather the
VPU could do.  The transpose plan (edges re-sorted by sender) makes the
backward pass dx = A^T dout the *same kernel* with swapped roles, so one
preprocessing step serves fwd+bwd.

Replaces torch_sparse / PyG MessagePassing gather-scatter (reference
mpnn.py:52,59 via CONV_DICT — SURVEY §2.3).

The tiling metadata ("plan") is built host-side once per batch by
:func:`spmm_plan` (the batcher attaches it to GraphBatch.spmm), so inside
jit the kernel only sees array inputs with static shapes.

v1 constraints (checked by `spmm_plan`, which sets ok=False for fallback):
  - x fits in VMEM (N * F * 4 <= ~6 MB — true for molecular batches);
  - per-tile sender/receiver spans fit the WS/WR windows (true for
    graph-contiguous batches of graphs with <= WINDOW nodes).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_EDGES = 256
WINDOW = 1024           # both sender and receiver windows
VMEM_X_BUDGET = 6 * 1024 * 1024

# Matmul precision: None follows jax_default_matmul_precision at trace
# time (so `runtime.matmul_precision: highest` reaches the kernels, not
# just the XLA paths — parity configs pin it and the kernels must not
# silently run bf16 MXU passes underneath); set_precision() overrides
# explicitly.  DEFAULT (bf16 passes) is ~2x faster and is what the
# unpinned configs get.
_PRECISION = None


def set_precision(p) -> None:
    global _PRECISION
    _PRECISION = p


def resolve_precision():
    """Trace-time matmul precision for the Pallas kernels."""
    if _PRECISION is not None:
        return _PRECISION
    p = jax.config.jax_default_matmul_precision
    return jax.lax.Precision(p) if p else jax.lax.Precision.DEFAULT


def resolve_interpret(interpret: bool | None) -> bool:
    """None -> auto: run the kernels natively on TPU, in interpret mode
    everywhere else (the CPU test path)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpmmPlanArrays:
    """Tiling metadata as arrays (a pytree — rides inside GraphBatch).

    fwd: out[recv] += x[send];  bwd (transpose): out[send] += g[recv].
    """

    ws: jnp.ndarray        # [T] sender-window starts
    wr: jnp.ndarray        # [T] receiver-window starts
    snd_rel: jnp.ndarray   # [T, TE] sender - ws  (== WINDOW if masked)
    rcv_rel: jnp.ndarray   # [T, TE] receiver - wr (== WINDOW if masked)
    t_ws: jnp.ndarray
    t_wr: jnp.ndarray
    t_snd_rel: jnp.ndarray
    t_rcv_rel: jnp.ndarray
    t_order: jnp.ndarray   # [E] permutation sorting edges by sender
    # Static metadata (part of the treedef): the kernels' one-hot width.
    # Narrower windows cut the one-hot MXU FLOPs linearly (2*window*F
    # MACs per edge), so the planner picks the narrowest feasible window
    # for the batch's node spans.
    window: int = dataclasses.field(metadata=dict(static=True),
                                    default=WINDOW)


def _windows(dst_vals, src_vals, mask, num_nodes, te, window=WINDOW):
    E = dst_vals.shape[0]
    T = E // te
    dv = dst_vals.reshape(T, te)
    sv = src_vals.reshape(T, te)
    m = mask.reshape(T, te)
    big = np.int32(num_nodes + 1)
    dv_m = np.where(m, dv, big)
    sv_m = np.where(m, sv, big)
    wr = np.where(m.any(1), dv_m.min(1), 0).astype(np.int32)
    ws = np.where(m.any(1), sv_m.min(1), 0).astype(np.int32)
    # No clamp to num_nodes - window: clamping widens the rel offsets of
    # end-of-range tiles past the window and rejects otherwise-feasible
    # plans (seen on the RCM lattice: spans ~565 but the last tiles'
    # clamped starts pushed offsets to 1027).  Instead the kernel call
    # pads the node arrays to align32(num_nodes) + window so every
    # [start, start + window) slice stays in bounds.
    # Sublane-align the dynamic window starts: Mosaic requires vector
    # loads/stores at indices provably divisible by the tile's sublane
    # count (8 for f32, 16 for bf16); 32 covers every dtype.  Aligning
    # down widens rel offsets by < 32; the span check below still guards.
    wr = (wr // 32) * 32
    ws = (ws // 32) * 32
    # Validate spans against the edge MASK, not the sentinel value: a real
    # edge with offset exactly == WINDOW would otherwise collide with the
    # masked-slot sentinel, pass the feasibility check, and be silently
    # dropped by the kernel (its one-hot row is all zeros).  The native
    # planner (native/batcher.cpp spmm_windows) rejects this same case.
    rcv_off = dv - wr[:, None]
    snd_off = sv - ws[:, None]
    if (m & ((rcv_off < 0) | (rcv_off >= window))).any():
        return None
    if (m & ((snd_off < 0) | (snd_off >= window))).any():
        return None
    rcv_rel = np.where(m, rcv_off, window).astype(np.int32)
    snd_rel = np.where(m, snd_off, window).astype(np.int32)
    return ws, wr, snd_rel, rcv_rel


def spmm_plan(senders: np.ndarray, receivers: np.ndarray,
              edge_mask: np.ndarray, num_nodes: int,
              tile_edges: int = TILE_EDGES, window: int = WINDOW):
    """Host-side plan construction.  Returns SpmmPlanArrays or None if the
    layout violates the window constraints (caller falls back to XLA)."""
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    edge_mask = np.asarray(edge_mask, bool)
    E = senders.shape[0]
    if E % tile_edges != 0:
        # The batcher pads edges to a multiple of 128; round the plan up
        # to the tile size with masked no-op edges (rel == WINDOW rows
        # produce all-zero one-hots in the kernel).  spmm_pallas pads the
        # runtime edge_weight to match.
        pad = tile_edges - E % tile_edges
        senders = np.concatenate([senders, np.zeros(pad, np.int32)])
        receivers = np.concatenate([receivers, np.zeros(pad, np.int32)])
        edge_mask = np.concatenate([edge_mask, np.zeros(pad, bool)])
    fwd = _windows(receivers, senders, edge_mask, num_nodes, tile_edges,
                   window)
    order = np.argsort(senders, kind="stable").astype(np.int32)
    bwd = _windows(senders[order], receivers[order], edge_mask[order],
                   num_nodes, tile_edges, window)
    if fwd is None or bwd is None:
        return None
    ws, wr, snd_rel, rcv_rel = fwd
    t_ws, t_wr, t_snd_rel, t_rcv_rel = bwd
    return SpmmPlanArrays(
        ws=ws, wr=wr, snd_rel=snd_rel, rcv_rel=rcv_rel,
        t_ws=t_ws, t_wr=t_wr, t_snd_rel=t_snd_rel, t_rcv_rel=t_rcv_rel,
        t_order=order, window=window)


# (tile_edges, window) candidates in measured preference order.  On-chip
# sweep (v5e, 32x150 molecular batch F=128, fwd+bwd, 400-iteration scan
# so the relay's fixed per-call cost is amortized out):
#   (1024,512) 147us  (512,512) 160us  (256,256) 171us  (1024,1024) 180us
#   (512,1024) 193us  (256,512) 210us  (256,1024) 211us
# The one-hot MACs scale with window; the per-tile fixed cost with the
# tile count — wide tiles + the narrowest feasible window win both.
PLAN_CANDIDATES = (
    (1024, 512), (512, 512), (256, 256), (1024, 1024),
    (512, 1024), (256, 512), (256, 1024),
)


def spmm_plan_auto(senders, receivers, edge_mask, num_nodes,
                   tile_sizes=None, candidates=PLAN_CANDIDATES):
    """Plan with the cheapest feasible (tile_edges, window) pair.

    Candidates are tried in ascending expected-cost order; returns None
    if even the most permissive pair violates the window constraint
    (caller falls back to XLA).  ``tile_sizes`` restricts candidates to
    those tile widths (legacy knob used by the bucket pinning path).
    """
    E = np.asarray(senders).shape[0]
    cands = [c for c in candidates
             if tile_sizes is None or c[0] in tuple(tile_sizes)]
    for i, (te, window) in enumerate(cands):
        last = i == len(cands) - 1
        if te > E and not last:
            continue    # don't pad a tiny batch's edges up several-fold
        plan = spmm_plan(senders, receivers, edge_mask, num_nodes,
                         tile_edges=te, window=window)
        if plan is not None:
            return plan
    return None


def _tile_partial(snd_rel, rcv_rel, w, x_win, window):
    """The shared tile body of all three SpMM kernels: weighted one-hot
    gather matmul + one-hot scatter matmul -> [WR, F] f32 partial.
    Masked edge slots have rel == window, outside the iota range, so
    their one-hot rows are all-zero.  The weighted one-hot is built in
    f32 (Mosaic only supports minor-dim broadcast insertion for 32-bit
    types) and cast to the MXU input dtype."""
    te = snd_rel.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, window), 1)
    g_onehot = (snd_rel[:, None] == iota).astype(jnp.float32)
    g_onehot = (g_onehot * w[:, None]).astype(x_win.dtype)
    msgs = jax.lax.dot_general(
        g_onehot, x_win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=resolve_precision())                                 # [TE, F]
    p_onehot = (rcv_rel[:, None] == iota).astype(x_win.dtype)
    return jax.lax.dot_general(
        p_onehot, msgs.astype(x_win.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=resolve_precision())                                 # [WR, F]


def _spmm_kernel(ws_ref, wr_ref, snd_rel_ref, rcv_rel_ref, w_ref, x_ref,
                 out_ref, *, window):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Plan starts are 32-aligned; the (//32)*32 form makes that divisible
    # structurally so Mosaic accepts sub-32-bit dtypes (bf16 sublane=16).
    ws = (ws_ref[t] // 32) * 32
    wr = (wr_ref[t] // 32) * 32
    x_win = x_ref[pl.ds(ws, window), :]                       # [WS, F]

    partial = _tile_partial(snd_rel_ref[0, 0], rcv_rel_ref[0, 0],
                            w_ref[0, 0], x_win, window)

    cur = out_ref[pl.ds(wr, window), :]
    out_ref[pl.ds(wr, window), :] = cur + partial


def _spmm_call(x, w, ws, wr, snd_rel, rcv_rel, num_nodes: int,
               interpret: bool = False, window: int = WINDOW):
    T, te = snd_rel.shape
    F = x.shape[-1]
    # Window starts are unclamped (only 32-aligned), so a start can sit
    # as high as num_nodes - 1: pad so every window slice is in bounds.
    n_pad = ((num_nodes + 31) // 32) * 32 + window
    if x.shape[0] < n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    # [T, 1, TE] layout: TPU requires the last two block dims to be
    # (equal-to-array, divisible by 128); a (1, TE) int32 block is not.
    w = w.reshape(T, 1, te).astype(jnp.float32)
    snd_rel3 = snd_rel.reshape(T, 1, te)
    rcv_rel3 = rcv_rel.reshape(T, 1, te)
    tile_spec = pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                    # ws, wr -> SMEM
        grid=(T,),
        in_specs=[
            tile_spec,                               # snd_rel
            tile_spec,                               # rcv_rel
            tile_spec,                               # w
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x whole
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
        interpret=interpret,
    )(ws, wr, snd_rel3, rcv_rel3, w, x)
    return out[:num_nodes]


def _spmm_hbm_kernel(ws_ref, wr_ref, snd_rel_ref, rcv_rel_ref, w_ref,
                     x_hbm, out_ref, scratch, sems, *, window):
    """Large-graph variant: x stays in HBM; per-tile sender windows are
    DMA'd into a double-buffered VMEM scratch, overlapping the next tile's
    fetch with the current tile's matmuls."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    def dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ws_ref[tile], window), :],
            scratch.at[slot],
            sems.at[slot])

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        dma(0, 0).start()

    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t + 1 < n_t)
    def _():
        dma(nxt, t + 1).start()

    dma(cur, t).wait()
    partial = _tile_partial(snd_rel_ref[0, 0], rcv_rel_ref[0, 0],
                            w_ref[0, 0], scratch[cur], window)
    wr = (wr_ref[t] // 32) * 32   # 32-aligned in the plan
    acc = out_ref[pl.ds(wr, window), :]
    out_ref[pl.ds(wr, window), :] = acc + partial


def _spmm_hbm_call(x, w, ws, wr, snd_rel, rcv_rel, num_nodes: int,
                   interpret: bool = False, window: int = WINDOW):
    T, te = snd_rel.shape
    F = x.shape[-1]
    # See _spmm_call: unclamped starts need align32(num_nodes) + window.
    n_pad = ((num_nodes + 31) // 32) * 32 + window
    if x.shape[0] < n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    w = w.reshape(T, 1, te).astype(jnp.float32)
    tile_spec = pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec(memory_space=pl.ANY),       # x stays off-chip
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, window, F), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_spmm_hbm_kernel, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
        interpret=interpret,
    )(ws, wr, snd_rel.reshape(T, 1, te), rcv_rel.reshape(T, 1, te), w, x)
    return out[:num_nodes]


def _spmm_hbm_out_kernel(ws_ref, wr_ref, snd_rel_ref, rcv_rel_ref, w_ref,
                         x_hbm, out_hbm, x_scratch, acc, x_sems, out_sem,
                         *, window, n_chunks):
    """Fully-streamed variant: BOTH x and out live in HBM.

    x windows ride the same double-buffered DMA as _spmm_hbm_kernel; the
    out window is read-modify-written through a VMEM accumulator.  The
    plan's receiver windows are non-decreasing (edges are receiver-sorted,
    so each tile's min receiver only grows), hence the only write-read
    hazard is between CONSECUTIVE tiles' overlapping windows — waiting
    out the write-back before the iteration ends (TPU grids execute
    sequentially) makes the next tile's read safe.  The out read itself
    overlaps the tile's matmuls.

    This removes the x<=2*VMEM budget ceiling (round-4 verdict item 6:
    the 51k-row 1-device full batch fell back to XLA because the out
    buffer exceeded VMEM even with x streamed)."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    def x_dma(slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ws_ref[tile], window), :],
            x_scratch.at[slot],
            x_sems.at[slot])

    @pl.when(t == 0)
    def _():
        # Zero the HBM out buffer chunk-by-chunk through the (still
        # unused) accumulator scratch, then kick off the first x fetch.
        acc[:] = jnp.zeros_like(acc)

        def zero_chunk(i, carry):
            cp = pltpu.make_async_copy(
                acc, out_hbm.at[pl.ds(i * window, window), :], out_sem)
            cp.start()
            cp.wait()
            return carry

        jax.lax.fori_loop(0, n_chunks, zero_chunk, 0)
        x_dma(0, 0).start()

    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t + 1 < n_t)
    def _():
        x_dma(nxt, t + 1).start()

    wr = wr_ref[t]                 # 32-aligned host-side
    in_cp = pltpu.make_async_copy(
        out_hbm.at[pl.ds(wr, window), :], acc, out_sem)
    in_cp.start()

    x_dma(cur, t).wait()
    partial = _tile_partial(snd_rel_ref[0, 0], rcv_rel_ref[0, 0],
                            w_ref[0, 0], x_scratch[cur], window)

    in_cp.wait()
    acc[:] = acc[:] + partial
    out_cp = pltpu.make_async_copy(
        acc, out_hbm.at[pl.ds(wr, window), :], out_sem)
    out_cp.start()
    out_cp.wait()                  # consecutive windows may overlap


def _spmm_hbm_out_call(x, w, ws, wr, snd_rel, rcv_rel, num_nodes: int,
                       interpret: bool = False, window: int = WINDOW):
    T, te = snd_rel.shape
    F = x.shape[-1]
    # Round n_pad to a multiple of window so the zeroing loop covers the
    # buffer exactly; window slices stay in bounds by construction.
    n_pad = ((num_nodes + 31) // 32) * 32 + window
    n_pad = ((n_pad + window - 1) // window) * window
    if x.shape[0] < n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    w = w.reshape(T, 1, te).astype(jnp.float32)
    tile_spec = pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec(memory_space=pl.ANY),       # x off-chip
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # out off-chip too
        scratch_shapes=[
            pltpu.VMEM((2, window, F), x.dtype),
            pltpu.VMEM((window, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_spmm_hbm_out_kernel, window=window,
                          n_chunks=n_pad // window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
        interpret=interpret,
    )(ws, wr, snd_rel.reshape(T, 1, te), rcv_rel.reshape(T, 1, te), w, x)
    return out[:num_nodes]


def spmm_pallas_hbm(x, plan: SpmmPlanArrays, edge_weight=None,
                    num_nodes: int | None = None,
                    interpret: bool | None = None,
                    weight_grad: bool = True,
                    stream_out: bool = False):
    """Large-graph fused SpMM: node features stream from HBM via
    double-buffered window DMA (no x-fits-in-VMEM constraint).  With
    ``stream_out=False`` the output block still lives in VMEM, so the
    regime is x up to ~2x the VMEM kernel's budget; ``stream_out=True``
    streams the output window through a VMEM accumulator as well
    (read-modify-write DMA), removing that ceiling — the 51k-row
    single-chip full batch rides the kernel instead of falling back to
    XLA.  Beyond single-chip HBM the sharded edge-partition machinery
    takes over (parallel/).

    Fully differentiable: dx runs the same HBM kernel with the transpose
    plan; dw is the HBM-streamed SDDMM (both windows DMA'd)."""
    interpret = resolve_interpret(interpret)
    n = num_nodes if num_nodes is not None else x.shape[0]
    E = plan.t_order.shape[0]
    _call = _spmm_hbm_out_call if stream_out else _spmm_hbm_call
    if edge_weight is None:
        w = jnp.ones((E,), x.dtype)
    elif edge_weight.shape[0] < E:
        w = jnp.pad(edge_weight, (0, E - edge_weight.shape[0]))
    else:
        w = edge_weight

    @jax.custom_vjp
    def _spmm(x, w):
        return _call(x, w, plan.ws, plan.wr, plan.snd_rel,
                     plan.rcv_rel, n, interpret,
                     window=plan.window)

    def fwd(x, w):
        # The plan rides through the RESIDUALS, not the bwd closure: a
        # closure-captured plan leaks fwd-trace tracers when the VJP is
        # applied in a different trace (grad THROUGH a shard_map whose
        # body calls this kernel — the sharded SCN/HSCN convention,
        # parallel/sharded_scn.py module docstring).
        return _spmm(x, w), (x, w, plan)

    def bwd(res, g):
        x, w, pl_ = res
        w_t = jnp.take(w, pl_.t_order, axis=0)
        dx = _call(g, w_t, pl_.t_ws, pl_.t_wr, pl_.t_snd_rel,
                   pl_.t_rcv_rel, n, interpret,
                   window=pl_.window)
        if weight_grad:
            from graph_hscn_tpu.ops.pallas.sddmm_kernel import \
                sddmm_pallas_hbm
            dw = sddmm_pallas_hbm(x, g, pl_, interpret=interpret)
        else:
            # Caller guarantees edge weights carry no trainable params
            # (gcn_norm etc.): skip the SDDMM — a third of the backward's
            # one-hot MACs.
            dw = jnp.zeros_like(w)
        # Kernels accumulate f32; cotangents must match primal dtypes.
        return dx.astype(x.dtype), dw.astype(w.dtype)

    _spmm.defvjp(fwd, bwd)
    return _spmm(x, w)


def spmm_pallas(x, plan: SpmmPlanArrays, edge_weight=None,
                num_nodes: int | None = None,
                interpret: bool | None = None,
                weight_grad: bool = True):
    """Differentiable fused SpMM using a batch-attached plan.

    x: [N, F]; edge_weight: [E] in receiver-sorted edge order or None.
    """
    interpret = resolve_interpret(interpret)
    n = num_nodes if num_nodes is not None else x.shape[0]
    E = plan.t_order.shape[0]       # plan edge count (tile-rounded)
    if edge_weight is None:
        w = jnp.ones((E,), x.dtype)
    elif edge_weight.shape[0] < E:
        # Plan was tile-rounded past the batch's edge padding; the extra
        # slots are masked (rel == WINDOW), their weight value is inert.
        w = jnp.pad(edge_weight, (0, E - edge_weight.shape[0]))
    else:
        w = edge_weight
    # Masked (padding) edges already have rel == WINDOW -> zero one-hot row.

    @jax.custom_vjp
    def _spmm(x, w):
        return _spmm_call(x, w, plan.ws, plan.wr, plan.snd_rel,
                          plan.rcv_rel, n, interpret, window=plan.window)

    def fwd(x, w):
        # Plan rides through residuals (see spmm_pallas_hbm.fwd: closure
        # capture leaks tracers under grad-through-shard_map).
        return _spmm(x, w), (x, w, plan)

    def bwd(res, g):
        x, w, pl_ = res
        w_t = jnp.take(w, pl_.t_order, axis=0)
        dx = _spmm_call(g, w_t, pl_.t_ws, pl_.t_wr, pl_.t_snd_rel,
                        pl_.t_rcv_rel, n, interpret, window=pl_.window)
        if weight_grad:
            # dw[e] = <g[recv e], x[send e]> — exactly the SDDMM kernel
            # with (h_src = x, h_dst = g); masked slots return 0.
            from graph_hscn_tpu.ops.pallas.sddmm_kernel import sddmm_pallas
            dw = sddmm_pallas(x, g, pl_, interpret=interpret)
        else:
            # Caller guarantees edge weights carry no trainable params
            # (gcn_norm etc.): skip the SDDMM — a third of the fwd+bwd
            # one-hot MACs (measured 147 -> ~125 us at (1024, 512) on the
            # molecular workload).
            dw = jnp.zeros_like(w)
        # Kernels accumulate f32; cotangents must match primal dtypes.
        return dx.astype(x.dtype), dw.astype(w.dtype)

    _spmm.defvjp(fwd, bwd)
    return _spmm(x, w)
