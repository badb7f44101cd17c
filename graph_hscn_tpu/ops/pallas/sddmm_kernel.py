"""Pallas SDDMM + segment-reduce kernels (companions to spmm_kernel.py).

SDDMM (sampled dense-dense matmul): per-edge dot products
    e[k] = < h_src[send[k]] , h_dst[recv[k]] >
— the kernel behind dot-product graph attention (GATv2/Transformer-style
scores) and the edge-score side of FusedMM-style GNN pipelines; replaces the
torch_sparse SDDMM the reference would hit inside PyG attention layers
(SURVEY §2.3).

segment-reduce: out[i] = sum_{e: recv[e]=i} msgs[e] for receiver-sorted
edges — the standalone scatter stage (graph readout over edges, GatedGCN
gate normalization), one windowed one-hot matmul per tile.

Both reuse the SpMM plan arrays (window starts + relative indices) built by
spmm_kernel.spmm_plan / the native batcher.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_hscn_tpu.ops.pallas.spmm_kernel import (SpmmPlanArrays,
                                                   resolve_precision,
                                                   resolve_interpret)


def _sddmm_kernel(ws_ref, wr_ref, snd_rel_ref, rcv_rel_ref, hs_ref, hd_ref,
                  out_ref, *, window):
    t = pl.program_id(0)
    # Plan starts are 32-aligned; (//32)*32 makes that structurally
    # provable so Mosaic accepts sub-32-bit dtypes (bf16 sublane=16).
    ws = (ws_ref[t] // 32) * 32
    wr = (wr_ref[t] // 32) * 32
    snd_rel = snd_rel_ref[0, 0]
    rcv_rel = rcv_rel_ref[0, 0]
    te = snd_rel.shape[0]

    hs_win = hs_ref[pl.ds(ws, window), :]
    hd_win = hd_ref[pl.ds(wr, window), :]

    iota = jax.lax.broadcasted_iota(jnp.int32, (te, window), 1)
    g1 = (snd_rel[:, None] == iota).astype(hs_ref.dtype)
    g2 = (rcv_rel[:, None] == iota).astype(hd_ref.dtype)
    a = jax.lax.dot_general(g1, hs_win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=resolve_precision())          # [TE, F]
    b = jax.lax.dot_general(g2, hd_win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=resolve_precision())          # [TE, F]
    out_ref[0, 0] = jnp.sum(a * b, axis=-1)


def sddmm_pallas(h_src, h_dst, plan: SpmmPlanArrays,
                 interpret: bool | None = None):
    """Per-edge dot products in receiver-sorted edge order: [E] float32.
    Masked (padding) edge slots return 0."""
    interpret = resolve_interpret(interpret)
    T, te = plan.snd_rel.shape
    # Unclamped window starts (see spmm_kernel._windows) need
    # align32(N) + window rows so every window slice is in bounds.
    n_pad = ((h_src.shape[0] + 31) // 32) * 32 + plan.window
    if h_src.shape[0] < n_pad:
        h_src = jnp.pad(h_src, ((0, n_pad - h_src.shape[0]), (0, 0)))
        h_dst = jnp.pad(h_dst, ((0, n_pad - h_dst.shape[0]), (0, 0)))
    tile_spec = pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            tile_spec, tile_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_kernel, window=plan.window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, te), jnp.float32),
        interpret=interpret,
    )(plan.ws, plan.wr,
      plan.snd_rel.reshape(T, 1, te), plan.rcv_rel.reshape(T, 1, te),
      h_src, h_dst)
    return out.reshape(T * te)


def _sddmm_hbm_kernel(ws_ref, wr_ref, snd_rel_ref, rcv_rel_ref, hs_hbm,
                      hd_hbm, out_ref, s_hs, s_hd, sem_hs, sem_hd, *,
                      window):
    """Large-graph SDDMM: BOTH operands stay in HBM; per-tile sender and
    receiver windows are DMA'd into double-buffered VMEM scratch (next
    tile's fetch overlaps the current tile's matmuls) — the dw side of
    the HBM SpMM backward (spmm_kernel.spmm_pallas_hbm)."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    def dma_hs(slot, tile):
        return pltpu.make_async_copy(
            hs_hbm.at[pl.ds(ws_ref[tile], window), :], s_hs.at[slot],
            sem_hs.at[slot])

    def dma_hd(slot, tile):
        return pltpu.make_async_copy(
            hd_hbm.at[pl.ds(wr_ref[tile], window), :], s_hd.at[slot],
            sem_hd.at[slot])

    @pl.when(t == 0)
    def _():
        dma_hs(0, 0).start()
        dma_hd(0, 0).start()

    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t + 1 < n_t)
    def _():
        dma_hs(nxt, t + 1).start()
        dma_hd(nxt, t + 1).start()

    dma_hs(cur, t).wait()
    dma_hd(cur, t).wait()
    hs_win = s_hs[cur]
    hd_win = s_hd[cur]
    snd_rel = snd_rel_ref[0, 0]
    rcv_rel = rcv_rel_ref[0, 0]
    te = snd_rel.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, window), 1)
    g1 = (snd_rel[:, None] == iota).astype(hs_win.dtype)
    g2 = (rcv_rel[:, None] == iota).astype(hd_win.dtype)
    a = jax.lax.dot_general(g1, hs_win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=resolve_precision())
    b = jax.lax.dot_general(g2, hd_win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=resolve_precision())
    out_ref[0, 0] = jnp.sum(a * b, axis=-1)


def sddmm_pallas_hbm(h_src, h_dst, plan: SpmmPlanArrays,
                     interpret: bool | None = None):
    """HBM-streamed per-edge dot products (same contract as sddmm_pallas,
    no operand-fits-in-VMEM constraint)."""
    interpret = resolve_interpret(interpret)
    T, te = plan.snd_rel.shape
    F = h_src.shape[-1]
    n_pad = ((h_src.shape[0] + 31) // 32) * 32 + plan.window
    if h_src.shape[0] < n_pad:
        h_src = jnp.pad(h_src, ((0, n_pad - h_src.shape[0]), (0, 0)))
        h_dst = jnp.pad(h_dst, ((0, n_pad - h_dst.shape[0]), (0, 0)))
    tile_spec = pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            tile_spec, tile_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, plan.window, F), h_src.dtype),
            pltpu.VMEM((2, plan.window, F), h_dst.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_hbm_kernel, window=plan.window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, te), jnp.float32),
        interpret=interpret,
    )(plan.ws, plan.wr,
      plan.snd_rel.reshape(T, 1, te), plan.rcv_rel.reshape(T, 1, te),
      h_src, h_dst)
    return out.reshape(T * te)


def _segment_reduce_kernel(wr_ref, rcv_rel_ref, msgs_ref, out_ref, *,
                           window):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    wr = (wr_ref[t] // 32) * 32     # 32-aligned in the plan (see spmm)
    rcv_rel = rcv_rel_ref[0, 0]
    te = rcv_rel.shape[0]
    msgs = msgs_ref[0]                                     # [TE, F]
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, window), 1)
    p_onehot = (rcv_rel[:, None] == iota).astype(msgs_ref.dtype)
    partial = jax.lax.dot_general(
        p_onehot, msgs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=resolve_precision())                              # [WR, F]
    cur = out_ref[pl.ds(wr, window), :]
    out_ref[pl.ds(wr, window), :] = cur + partial


def segment_reduce_pallas(msgs, plan: SpmmPlanArrays, num_nodes: int,
                          interpret: bool | None = None):
    """out[i] = sum of msgs over receiver-sorted edges with recv == i.
    msgs: [E, F] aligned with the plan's edge order (masked slots must be
    zeroed by the caller; tile-rounded plans need msgs padded to T*te)."""
    interpret = resolve_interpret(interpret)
    T, te = plan.rcv_rel.shape
    F = msgs.shape[-1]
    n_pad = ((num_nodes + 31) // 32) * 32 + plan.window
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, te, F), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_segment_reduce_kernel, window=plan.window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
        interpret=interpret,
    )(plan.wr, plan.rcv_rel.reshape(T, 1, te),
      msgs.reshape(T, te, F))
    return out[:num_nodes]
