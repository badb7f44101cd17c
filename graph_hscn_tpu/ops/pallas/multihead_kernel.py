"""Multi-head windowed one-hot kernels: SpMM with per-head edge weights
and a head-blocked SDDMM — one kernel launch for ALL heads.

Motivation (VERDICT round-2 item 2): GAT attention aggregation previously
launched H separate single-head SpMM kernels from a Python loop
(models/layers.py), each re-staging the same x windows; and the forward
attention logits ``e = a_src[senders] + a_dst[receivers]`` ran as XLA
[E, H] gathers (row-at-a-time on TPU).  Both are one kernel pass here.

Layout: features head-blocked on the minor axis, x[:, h*C:(h+1)*C] is
head h; per-edge weights alpha[E, H].  Per tile t:

    msgs     = G_t @ x[ws : ws+W]                 [TE, H*C]  (one-hot MXU)
    weighted = msgs * (alpha_t^T S^T)             per-head broadcast via a
                                                  block-selector matmul
    out[wr : wr+W] += P_t^T @ weighted            [W, H*C]

with S[f, h] = 1 iff f // C == h (the head-block selector, built from
iota in-register).  The head broadcast and the blocked SDDMM's per-head
sums are small MXU matmuls instead of Mosaic-hostile minor-axis
reshapes/slices.

The blocked SDDMM ``sddmm_mh`` computes per-edge per-head dots
    out[e, h] = < h_src[send_e, hC:(h+1)C] , h_dst[recv_e, hC:(h+1)C] >
which serves both d(alpha) in the multihead SpMM VJP (C = head dim) and
the GAT forward logits (C = 2 with [a_src, 1] / [1, a_dst] blocks).

Replaces torch_sparse SDDMM + scatter-based multi-head attention
aggregation (reference GATConv via CONV_DICT, mpnn.py:52; SURVEY §2.3).
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


def _selector(H: int, C: int, dtype):
    """S[f, h] = 1 iff f // C == h, built in-register from iotas."""
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (H * C, H), 0)
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (H * C, H), 1)
    return (f_iota // C == h_iota).astype(dtype)


def _spmm_mh_kernel(ws_ref, wr_ref, snd_rel_ref, rcv_rel_ref, w_ref, x_ref,
                    out_ref, *, window, heads):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ws = (ws_ref[t] // 32) * 32
    wr = (wr_ref[t] // 32) * 32
    x_win = x_ref[pl.ds(ws, window), :]                       # [W, H*C]

    snd_rel = snd_rel_ref[0, 0]                               # [TE]
    rcv_rel = rcv_rel_ref[0, 0]
    alpha = w_ref[0]                                          # [H, TE]
    te = snd_rel.shape[0]
    HC = x_ref.shape[-1]
    C = HC // heads

    iota = jax.lax.broadcasted_iota(jnp.int32, (te, window), 1)
    g_onehot = (snd_rel[:, None] == iota).astype(x_ref.dtype)
    msgs = jax.lax.dot_general(
        g_onehot, x_win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=resolve_precision())                                 # [TE, H*C]

    # Per-head weight broadcast: alpha^T S^T as one dot_general —
    # [H, TE] x [H*C, H] contracting the H axes -> [TE, H*C].
    sel = _selector(heads, C, jnp.float32)
    w_exp = jax.lax.dot_general(
        alpha.astype(jnp.float32), sel, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=resolve_precision())                                 # [TE, H*C]
    weighted = (msgs * w_exp).astype(x_ref.dtype)

    p_onehot = (rcv_rel[:, None] == iota).astype(x_ref.dtype)
    partial = jax.lax.dot_general(
        p_onehot, weighted, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=resolve_precision())                                 # [W, H*C]

    cur = out_ref[pl.ds(wr, window), :]
    out_ref[pl.ds(wr, window), :] = cur + partial


def _spmm_mh_call(x, alpha, ws, wr, snd_rel, rcv_rel, num_nodes: int,
                  heads: int, interpret: bool, window: int):
    T, te = snd_rel.shape
    HC = x.shape[-1]
    n_pad = ((num_nodes + 31) // 32) * 32 + window
    if x.shape[0] < n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    # alpha [E, H] -> [T, H, TE] blocks: lane dim te (128-multiple), the
    # sublane dim equals the array's H.
    alpha3 = alpha.reshape(T, te, heads).transpose(0, 2, 1)
    alpha3 = alpha3.astype(jnp.float32)
    tile_spec = pl.BlockSpec((1, 1, te), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            tile_spec,                                    # snd_rel
            tile_spec,                                    # rcv_rel
            pl.BlockSpec((1, heads, te), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),        # alpha
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x whole
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_spmm_mh_kernel, window=window, heads=heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, HC), jnp.float32),
        interpret=interpret,
    )(ws, wr, snd_rel.reshape(T, 1, te), rcv_rel.reshape(T, 1, te),
      alpha3, x)
    return out[:num_nodes]


def _sddmm_mh_kernel(ws_ref, wr_ref, snd_rel_ref, rcv_rel_ref, hs_ref,
                     hd_ref, out_ref, *, window, heads):
    t = pl.program_id(0)
    ws = (ws_ref[t] // 32) * 32
    wr = (wr_ref[t] // 32) * 32
    snd_rel = snd_rel_ref[0, 0]
    rcv_rel = rcv_rel_ref[0, 0]
    te = snd_rel.shape[0]
    HC = hs_ref.shape[-1]
    C = HC // heads

    hs_win = hs_ref[pl.ds(ws, window), :]
    hd_win = hd_ref[pl.ds(wr, window), :]

    iota = jax.lax.broadcasted_iota(jnp.int32, (te, window), 1)
    g1 = (snd_rel[:, None] == iota).astype(hs_ref.dtype)
    g2 = (rcv_rel[:, None] == iota).astype(hd_ref.dtype)
    a = jax.lax.dot_general(g1, hs_win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=resolve_precision())             # [TE, H*C]
    b = jax.lax.dot_general(g2, hd_win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=resolve_precision())             # [TE, H*C]
    prod = a * b
    # Per-head block sums as a selector matmul: [H*C, H] x [TE, H*C]
    # contracting H*C -> [H, TE] (matches the out block layout).
    sel = _selector(heads, C, jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        sel, prod, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=resolve_precision())                                 # [H, TE]


def _sddmm_mh_call(h_src, h_dst, ws, wr, snd_rel, rcv_rel, heads: int,
                   interpret: bool, window: int):
    T, te = snd_rel.shape
    n_pad = ((h_src.shape[0] + 31) // 32) * 32 + window
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
        out_specs=pl.BlockSpec((1, heads, te), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_mh_kernel, window=window, heads=heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, heads, te), jnp.float32),
        interpret=interpret,
    )(ws, wr, snd_rel.reshape(T, 1, te), rcv_rel.reshape(T, 1, te),
      h_src, h_dst)
    # [T, H, TE] -> [E, H] in plan edge order.
    return out.transpose(0, 2, 1).reshape(T * te, heads)


def _pad_alpha(alpha, E):
    if alpha.shape[0] < E:
        return jnp.pad(alpha, ((0, E - alpha.shape[0]), (0, 0)))
    return alpha


def spmm_mh(x, alpha, plan: SpmmPlanArrays, heads: int,
            num_nodes: int | None = None,
            interpret: bool | None = None):
    """Multi-head weighted aggregation, all heads in ONE kernel launch:

        out[i, hC:(h+1)C] = sum_{e: recv_e = i} alpha[e, h] *
                            x[send_e, hC:(h+1)C]

    x: [N, H*C] head-blocked; alpha: [E, H] in receiver-sorted plan edge
    order (padded slots inert via the plan's masked one-hot rows).
    Differentiable in x AND alpha (d(alpha) via the blocked SDDMM; dx via
    the transpose plan — both single launches)."""
    interpret = resolve_interpret(interpret)
    n = num_nodes if num_nodes is not None else x.shape[0]
    E = plan.t_order.shape[0]
    alpha = _pad_alpha(alpha, E)

    @jax.custom_vjp
    def _f(x, alpha):
        return _spmm_mh_call(x, alpha, plan.ws, plan.wr, plan.snd_rel,
                             plan.rcv_rel, n, heads, interpret,
                             plan.window)

    def fwd(x, alpha):
        return _f(x, alpha), (x, alpha)

    def bwd(res, g):
        x, alpha = res
        a_t = jnp.take(alpha, plan.t_order, axis=0)
        dx = _spmm_mh_call(g, a_t, plan.t_ws, plan.t_wr, plan.t_snd_rel,
                           plan.t_rcv_rel, n, heads, interpret,
                           plan.window)
        da = _sddmm_mh_call(x, g, plan.ws, plan.wr, plan.snd_rel,
                            plan.rcv_rel, heads, interpret, plan.window)
        return dx.astype(x.dtype), da.astype(alpha.dtype)

    _f.defvjp(fwd, bwd)
    return _f(x, alpha)


def sddmm_mh(h_src, h_dst, plan: SpmmPlanArrays, heads: int,
             interpret: bool | None = None):
    """Head-blocked per-edge dots (receiver-sorted plan edge order):

        out[e, h] = < h_src[send_e, hC:(h+1)C], h_dst[recv_e, hC:(h+1)C] >

    Masked slots return 0.  Differentiable in both operands (each VJP is
    one multihead SpMM: d h_src gathers g-weighted h_dst blocks through
    the transpose plan, d h_dst through the forward plan)."""
    interpret = resolve_interpret(interpret)
    n_src = h_src.shape[0]

    @jax.custom_vjp
    def _f(h_src, h_dst):
        return _sddmm_mh_call(h_src, h_dst, plan.ws, plan.wr, plan.snd_rel,
                              plan.rcv_rel, heads, interpret, plan.window)

    def fwd(h_src, h_dst):
        return _f(h_src, h_dst), (h_src, h_dst)

    def bwd(res, g):
        h_src, h_dst = res
        # d h_src[s, block h] = sum_{e: send_e = s} g[e, h] h_dst[recv_e,
        # block h] -> multihead SpMM over the TRANSPOSE plan (edges by
        # sender, "receiver" side = the original receivers).
        g_t = jnp.take(g, plan.t_order, axis=0)
        d_src = _spmm_mh_call(h_dst, g_t, plan.t_ws, plan.t_wr,
                              plan.t_snd_rel, plan.t_rcv_rel, n_src,
                              heads, interpret, plan.window)
        # d h_dst[r, block h] = sum_{e: recv_e = r} g[e, h] h_src[send_e,
        # block h] -> multihead SpMM over the FORWARD plan.
        d_dst = _spmm_mh_call(h_src, g, plan.ws, plan.wr, plan.snd_rel,
                              plan.rcv_rel, n_src, heads, interpret,
                              plan.window)
        return d_src.astype(h_src.dtype), d_dst.astype(h_dst.dtype)

    _f.defvjp(fwd, bwd)
    return _f(h_src, h_dst)


def gat_edge_logits(a_src, a_dst, plan: SpmmPlanArrays,
                    interpret: bool | None = None):
    """Per-edge attention logits  e[k, h] = a_src[send_k, h] +
    a_dst[recv_k, h]  as ONE blocked-SDDMM launch (C = 2) instead of two
    XLA [E, H] row-at-a-time gathers.

    a_src, a_dst: [N, H].  Returns [E, H] in plan edge order (masked
    slots 0); differentiable through sddmm_mh's custom VJP."""
    N, H = a_src.shape
    dt = a_src.dtype
    # Head blocks [a_src[:, h], 1] . [1, a_dst[:, h]].
    hs = jnp.stack([a_src, jnp.ones((N, H), dt)], axis=-1).reshape(N, 2 * H)
    hd = jnp.stack([jnp.ones((N, H), dt), a_dst], axis=-1).reshape(N, 2 * H)
    return sddmm_mh(hs, hd, plan, heads=H, interpret=interpret)
