"""Sparse message aggregation: gather -> (optional edge transform) -> segment
reduce.  This is the compute core of every conv layer, replacing PyG's
MessagePassing gather/scatter machinery (reference mpnn.py:52,59 and
hscn.py:57,109 via torch_sparse kernels).

Two interchangeable backends:
  - ``xla``   : jnp.take + sorted segment_sum.  Always available; this is the
                reference semantics and the CPU test path.
  - ``pallas``: fused CSR row-gather/accumulate kernel (ops/pallas/spmm_kernel
                .py) for TPU.  Selected automatically on TPU for large
                feature dims; falls back to xla elsewhere.

The aggregation is expressed as a CSR SpMM: with edges sorted by receiver,
``out[i] = sum_{e: recv[e]=i} w[e] * x[send[e]]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from graph_hscn_tpu.ops.segment import segment_sum

_BACKEND = "auto"  # "auto" | "xla" | "pallas"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "xla", "pallas")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def _use_pallas() -> bool:
    if _BACKEND == "xla":
        return False
    if _BACKEND == "pallas":
        return True
    return jax.default_backend() == "tpu"


def pallas_enabled() -> bool:
    """Public backend predicate for layers that call the Pallas kernels
    directly (GATConv attention aggregation, sharded local aggregation)
    rather than through gather_scatter."""
    return _use_pallas()


def gather_scatter(
    x: jnp.ndarray,          # [N, F] node features
    senders: jnp.ndarray,    # [E] int32
    receivers: jnp.ndarray,  # [E] int32, sorted ascending
    *,
    num_nodes: int | None = None,
    edge_weight: jnp.ndarray | None = None,   # [E] or None
    messages_out: bool = False,
    plan=None,               # SpmmPlanArrays from GraphBatch.spmm
    weight_needs_grad: bool = False,
) -> jnp.ndarray:
    """out[i] = sum over incoming edges of (w_e * x[sender_e]).

    If a Pallas plan is attached and the backend allows, uses the fused
    windowed one-hot MXU kernel (ops/pallas/spmm_kernel.py), including
    d/d(edge_weight) via the SDDMM kernel; otherwise the XLA gather +
    sorted-segment-sum path.

    ``weight_needs_grad=False`` (the default) declares that the edge
    weights carry no trainable parameters (gcn_norm / mask-derived — true
    for every in-repo caller), letting the Pallas backward skip the SDDMM
    dw kernel (a third of its one-hot MACs).  Set it True if you pass an
    edge_weight that depends on trainable params.  The declaration is
    enforced backend-independently: with False, edge_weight is
    stop_gradient'ed on EVERY path, so d(edge_weight) is zero on the XLA
    path too rather than silently backend-dependent (round-3 advisor
    finding).

    If ``messages_out`` is True also returns the per-edge gathered messages
    (before reduction), which some layers (GatedGCN) reuse.
    """
    num_nodes = num_nodes if num_nodes is not None else x.shape[0]
    if edge_weight is not None and not weight_needs_grad:
        edge_weight = jax.lax.stop_gradient(edge_weight)
    if plan is not None and _use_pallas() and not messages_out:
        from graph_hscn_tpu.ops.pallas.spmm_kernel import (VMEM_X_BUDGET,
                                                           spmm_pallas,
                                                           spmm_pallas_hbm)
        # Mosaic lane-pads the minor dim to 128 in VMEM: a narrow
        # feature matrix (e.g. K=8 cluster columns) occupies full-lane
        # tiles, so budget against the PADDED footprint (seen: a
        # [52k, 8] f32 out-buffer demanding 26 MB of scoped vmem).
        xbytes = x.shape[0] * max(x.shape[1], 128) * x.dtype.itemsize
        if xbytes <= VMEM_X_BUDGET:
            return spmm_pallas(x, plan, edge_weight=edge_weight,
                               num_nodes=num_nodes,
                               weight_grad=weight_needs_grad)
        if xbytes <= 2 * VMEM_X_BUDGET:
            # Oversize-for-VMEM single-chip regime: stream x from HBM
            # (double-buffered window DMA); fully differentiable.  The
            # scratch buffers follow x.dtype, so bf16 compute rides this
            # band too — exactly the bandwidth-bound regime where halved
            # payloads pay (bf16 xbytes also halve, widening the VMEM
            # band; this branch is then bf16 N up to ~4x the f32 VMEM N).
            return spmm_pallas_hbm(x, plan, edge_weight=edge_weight,
                                   num_nodes=num_nodes,
                                   weight_grad=weight_needs_grad)
        # Beyond ~2x the VMEM budget the out buffer no longer fits in
        # VMEM either: stream BOTH x and out (windowed RMW through a
        # VMEM accumulator).  Only the per-window scratch must fit —
        # which caps F, not N.  Model the actual allocation: a
        # double-buffered x window in x.dtype plus an f32 accumulator
        # (spmm_kernel._spmm_hbm_out_call scratch_shapes).
        f_pad = max(x.shape[1], 128)
        scratch = plan.window * f_pad * (2 * x.dtype.itemsize + 4)
        if scratch <= VMEM_X_BUDGET:
            return spmm_pallas_hbm(x, plan, edge_weight=edge_weight,
                                   num_nodes=num_nodes,
                                   weight_grad=weight_needs_grad,
                                   stream_out=True)
        # Pathologically wide features — XLA fallback (or the sharded
        # edge-partition path).
    msgs = jnp.take(x, senders, axis=0)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    out = segment_sum(msgs, receivers, num_nodes, indices_are_sorted=True)
    if messages_out:
        return out, msgs
    return out


@functools.partial(jax.jit, static_argnames=("num_nodes", "add_self_loops"))
def gcn_norm_weights(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: jnp.ndarray,
    num_nodes: int,
    add_self_loops: bool = True,
    edge_weight: jnp.ndarray | None = None,
):
    """Symmetric GCN normalization  D^-1/2 (A+I) D^-1/2, matching PyG's
    ``gcn_norm`` (used at reference train_clustering.py:37-42 and inside
    GCNConv).

    Returns per-edge weights for the existing edge list plus, when
    ``add_self_loops``, the per-node self-loop weight ``1/(deg_i+1)`` to be
    applied as a separate diagonal term (we never materialize extra edges —
    the self-loop contribution is added as ``diag * x`` in the conv).

    With ``edge_weight`` the degree is the WEIGHTED in-degree and the
    returned weights are ``w_e * dinv[send] * dinv[recv]`` (PyG gcn_norm
    semantics: deg = scatter_add(edge_weight), self-loop weight 1);
    without it, deg counts incoming real edges + 1 for the self loop.
    """
    ones = jnp.where(edge_mask,
                     1.0 if edge_weight is None else edge_weight, 0.0)
    deg = segment_sum(ones, receivers, num_nodes, indices_are_sorted=True)
    if add_self_loops:
        deg = deg + 1.0
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    w = inv_sqrt[senders] * inv_sqrt[receivers]
    if edge_weight is not None:
        w = w * edge_weight
    w = jnp.where(edge_mask, w, 0.0)
    diag = inv_sqrt * inv_sqrt if add_self_loops else None
    return w, diag
