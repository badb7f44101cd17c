"""Fused multi-layer dense GCN stack — one Pallas kernel per direction.

For slotted molecular batches the dense path runs each layer as a separate
batched matmul; with L layers the forward+backward costs ~4L dispatched ops.
This kernel runs the ENTIRE stack in one op per direction:

  forward:  h_0 = x;  h_l = act_l( A_hat @ (h_{l-1} @ W_l) + b_l )
            where A_hat = D^-1/2 (A) D^-1/2 + diag(1/(deg+1)) — the folded
            self-loop GCN operator (identical math to
            models.layers.GCNConv / ops.dense path), act_l = relu for
            hidden layers, identity for the last.
  backward: reverse sweep re-using the stored per-layer activations;
            dW/db accumulate across graph blocks in revisited VMEM
            outputs (sequential TPU grid).

Grid: one step per graph block; weights replicated in VMEM; activations
[G, S, F_l] streamed per block.  Padding rows carry relu(b) garbage exactly
like the unfused dense path (masked by the model before readout) and
receive zero cotangents, so gradients are clean.

Dropout (hidden layers, post-activation — same placement as the unfused
MPNN, models/mpnn.py): masks are generated IN-KERNEL via the TPU hardware
PRNG (`pltpu.prng_seed` / `prng_random_bits`), seeded per (graph block,
layer) from one traced scalar, so no [G, S, F] mask arrays ever touch HBM.
The stored per-layer activations are POST-dropout; the backward pass needs
no bits at all — for an element of h_post, h_post > 0 iff (kept and
pre-relu z > 0), and the kept value carries the 1/(1-p) scale, so
dz = dh * (h_post > 0) * 1/(1-p) reproduces relu'∘mask exactly.  CPU tests
(where the TPU PRNG has no interpret-mode implementation) pass externally
generated uint32 bits through the identical post-bits math.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Follows jax_default_matmul_precision at trace time (parity configs pin
# `runtime.matmul_precision: highest`; the fused stack must honor it the
# same way the unfused XLA path does — round-5 fix: the 24x24 GCN parity
# study regressed because the fused kernel silently ran bf16 MXU passes
# under a config that pinned f32-exact matmuls).
from graph_hscn_tpu.ops.pallas.spmm_kernel import resolve_precision


def _fwd_kernel(adj_ref, x_ref, *refs, num_layers: int, rate: float = 0.0,
                bits_source: str = "none"):
    # refs: W_1..W_L, b_1..b_L, [seed | bits_1..bits_{L-1}], out h_1..h_L
    L = num_layers
    ws = refs[:L]
    bs = refs[L:2 * L]
    k = 2 * L
    seed_ref = None
    bits_refs = None
    if rate > 0.0 and bits_source == "seed":
        seed_ref = refs[k]
        k += 1
    elif rate > 0.0 and bits_source == "bits":
        bits_refs = refs[k:k + L - 1]
        k += L - 1
    outs = refs[k:]
    # Compute dtype rides the operands (f32 or bf16); every matmul
    # accumulates f32 (preferred_element_type) and all elementwise math
    # (bias, relu, dropout) happens on the f32 accumulator — only the
    # MXU operands and the stored hidden activations are narrow.
    a = adj_ref[0]                       # [S, S] folded operator
    h = x_ref[0]
    cd = a.dtype
    thr = np.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    scale = np.float32(1.0 / (1.0 - rate)) if rate > 0.0 else None
    for l in range(L):
        y = jax.lax.dot_general(h, ws[l][:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=resolve_precision())
        z = jax.lax.dot_general(a, y.astype(cd),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=resolve_precision())
        z = z + bs[l][:]
        if l < L - 1:
            h = jnp.maximum(z, 0.0)
            if rate > 0.0:
                if seed_ref is not None:
                    # Distinct stream per (graph block, layer).
                    pltpu.prng_seed(seed_ref[0]
                                    + pl.program_id(0) * L + l)
                    bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape),
                                         jnp.uint32)
                else:
                    bits = bits_refs[l][0]
                h = jnp.where(bits >= thr, h * scale, 0.0)
            h = h.astype(outs[l].dtype)
        else:
            h = z                         # logits stay f32
        outs[l][0] = h


def _bwd_kernel(adj_ref, x_ref, *refs, num_layers: int, rate: float = 0.0):
    # refs: W_1..W_L, h_1..h_L (acts), g (dL/dh_L),
    #       outputs: dx, dW_1..dW_L, db_1..db_L
    L = num_layers
    ws = refs[:L]
    acts = refs[L:2 * L]
    g_ref = refs[2 * L]
    dx_ref = refs[2 * L + 1]
    dws = refs[2 * L + 2: 2 * L + 2 + L]
    dbs = refs[2 * L + 2 + L:]

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for l in range(L):
            dws[l][:] = jnp.zeros_like(dws[l])
            dbs[l][:] = jnp.zeros_like(dbs[l])

    a = adj_ref[0]
    cd = a.dtype                         # compute dtype (f32 or bf16)
    dz = g_ref[0]                        # cotangent of h_L (pre-masked)
    for l in range(L - 1, -1, -1):
        h_prev = x_ref[0] if l == 0 else acts[l - 1][0]
        # out = A (h_prev W) + b ; act applied after (handled via dz).
        dbs[l][0] += jnp.sum(dz, axis=0)
        dy = jax.lax.dot_general(a, dz.astype(cd),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=resolve_precision())         # A^T dz
        dyc = dy.astype(cd)
        dws[l][:] += jax.lax.dot_general(
            h_prev, dyc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=resolve_precision())
        dh = jax.lax.dot_general(dyc, ws[l][:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=resolve_precision())         # dy W^T
        if l > 0:
            # acts are POST-dropout: h_post > 0 iff kept and z > 0; kept
            # values carry the 1/(1-p) scale, so this is mask ∘ relu'.
            # (compare in f32 — Mosaic has no bf16 cmpf on this target)
            keep = (acts[l - 1][0].astype(jnp.float32) > 0.0)
            keep = keep.astype(jnp.float32)
            if rate > 0.0:
                keep = keep * np.float32(1.0 / (1.0 - rate))
            dz = dh * keep
        else:
            dx_ref[0] = dh.astype(dx_ref.dtype)


def _folded_operator(adj, add_self_loops=True):
    """A_hat = D^-1/2 A D^-1/2 + diag(1/(deg+1)) on dense blocks."""
    deg = jnp.sum(adj, axis=-1) + (1.0 if add_self_loops else 0.0)
    inv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    a = adj * inv[:, :, None] * inv[:, None, :]
    if add_self_loops:
        s = adj.shape[-1]
        eye = jnp.eye(s, dtype=adj.dtype)
        a = a + eye * (inv * inv)[:, :, None]
    return a


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_gcn_stack(x_blocks, adj, params, dropout=None, rate=0.0,
                    interpret=False):
    """x_blocks [G, S, F0], adj [G, S, S] raw adjacency,
    params: list of {kernel [F_in, F_out], bias [F_out]}.
    ``dropout`` (used only when ``rate`` > 0): {"seed": int32[1]} for
    in-kernel TPU PRNG masks, or {"bits": [uint32[G,S,F_l] per hidden
    layer]} for externally generated bits (CPU tests).
    Returns h_L [G, S, F_L]."""
    outs = _fwd(x_blocks, adj, params, dropout, rate, interpret)
    return outs[-1]


def _block_specs_params(params):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params]


def _dropout_inputs(dropout, rate, num_layers, blk):
    """(bits_source, extra inputs, extra in_specs) for the fwd call."""
    if rate <= 0.0:
        return "none", [], []
    if dropout is None or not isinstance(dropout, dict):
        raise ValueError("rate > 0 needs dropout={'seed': ...} or "
                         "{'bits': [...]}")
    if "seed" in dropout:
        return "seed", [dropout["seed"]], [
            pl.BlockSpec(memory_space=pltpu.SMEM)]
    bits = dropout["bits"]
    assert len(bits) == num_layers - 1, (
        f"need {num_layers - 1} hidden-layer bit arrays, got {len(bits)}")
    return "bits", list(bits), [blk(b.shape) for b in bits]


def _fwd(x_blocks, adj, params, dropout, rate, interpret):
    G, S, F0 = x_blocks.shape
    L = len(params)
    cd = x_blocks.dtype   # compute dtype: f32, or bf16 (mixed precision)
    # Fold the operator in f32 (rsqrt in bf16 loses degree precision),
    # then narrow the MXU operand.
    a_hat = _folded_operator(adj.astype(jnp.float32)).astype(cd)
    ws = [p["kernel"].astype(cd) for p in params]
    bs = [p["bias"].astype(jnp.float32).reshape(1, -1) for p in params]
    # Hidden activations stored in the compute dtype (the HBM-bandwidth
    # lever); logits stay f32.
    out_shapes = [jax.ShapeDtypeStruct(
        (G, S, w.shape[1]), cd if li < L - 1 else jnp.float32)
        for li, w in enumerate(ws)]
    blk = lambda shape: pl.BlockSpec((1,) + shape[1:],
                                     lambda g: (g,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    source, extra_in, extra_specs = _dropout_inputs(dropout, rate, L, blk)
    outs = pl.pallas_call(
        partial(_fwd_kernel, num_layers=L, rate=float(rate),
                bits_source=source),
        grid=(G,),
        in_specs=([blk(a_hat.shape), blk(x_blocks.shape)]
                  + _block_specs_params(ws) + _block_specs_params(bs)
                  + extra_specs),
        out_specs=[blk(s.shape) for s in out_shapes],
        out_shape=out_shapes,
        interpret=interpret,
    )(a_hat, x_blocks, *ws, *bs, *extra_in)
    return outs


def _fused_fwd(x_blocks, adj, params, dropout, rate, interpret):
    outs = _fwd(x_blocks, adj, params, dropout, rate, interpret)
    return outs[-1], (x_blocks, adj, params, dropout, outs)


def _fused_bwd(rate, interpret, res, g):
    x_blocks, adj, params, dropout, acts = res
    G, S, F0 = x_blocks.shape
    L = len(params)
    cd = x_blocks.dtype
    a_hat = _folded_operator(adj.astype(jnp.float32)).astype(cd)
    ws = [p["kernel"].astype(cd) for p in params]
    blk = lambda shape: pl.BlockSpec((1,) + shape[1:],
                                     lambda gg: (gg,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = ([jax.ShapeDtypeStruct((G, S, F0), cd)]
                  + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                     for w in ws]
                  + [jax.ShapeDtypeStruct((1, w.shape[1]), jnp.float32)
                     for w in ws])
    out_specs = ([blk((G, S, F0))] + [full() for _ in ws]
                 + [full() for _ in ws])
    results = pl.pallas_call(
        partial(_bwd_kernel, num_layers=L, rate=float(rate)),
        grid=(G,),
        in_specs=([blk(a_hat.shape), blk(x_blocks.shape)]
                  + _block_specs_params(ws)
                  + [blk(a.shape) for a in acts]
                  + [blk(g.shape)]),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(a_hat, x_blocks, *ws, *acts, g)
    dx = results[0]
    dws = results[1:1 + L]
    dbs = results[1 + L:]
    dparams = [{"kernel": dws[l], "bias": dbs[l].reshape(-1)}
               for l in range(L)]
    # adj is data-derived (no gradient); dropout seeds/bits are integer
    # inputs whose cotangent type is float0.
    d_dropout = jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), dropout)
    return dx, jnp.zeros_like(adj), dparams, d_dropout


fused_gcn_stack.defvjp(_fused_fwd, _fused_bwd)
