"""Graph conv layers (flax.linen) with PyG-parity math.

Each layer documents the exact equations of the PyTorch-Geometric layer it
replaces (the reference's CONV_DICT, config.py:19-23), because the parity
harness (tests/test_parity.py) asserts per-layer allclose against
hand-written numpy transcriptions of those equations.

All layers consume the flat CSR representation of a GraphBatch:
  x [N, F], senders [E], receivers [E] (sorted), edge_mask [E]
and are pure w.r.t. padding: padded rows in, zero rows out.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_hscn_tpu.ops.segment import segment_softmax, segment_sum
from graph_hscn_tpu.ops.spmm import (gather_scatter, gcn_norm_weights,
                                     pallas_enabled)

glorot = nn.initializers.glorot_uniform()
zeros = nn.initializers.zeros


def resolve_dtype(name: str | None):
    """Config string -> compute dtype (None = native float32)."""
    if name in (None, "", "float32", "f32"):
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"Unknown compute_dtype {name!r}")


def _to_blocks(x, slot: int):
    """Flat slotted [G*slot, F] -> [G, slot, F] (free reshape)."""
    return x.reshape(-1, slot, x.shape[-1])


def _from_blocks(xb):
    return xb.reshape(-1, xb.shape[-1])


class GCNConv(nn.Module):
    """PyG GCNConv:  X' = D^-1/2 (A + I) D^-1/2 X W + b.

    Self-loops are folded in as a diagonal term (weight 1/(deg_i+1)) rather
    than materialized edges, which keeps the edge array static.
    Matches torch_geometric.nn.GCNConv with default args
    (reference mpnn.py:52 via CONV_DICT["gcn"]).
    """

    features: int
    add_self_loops: bool = True
    normalize: bool = True
    use_bias: bool = True
    dtype: Any = None   # compute dtype (params stay float32)

    @staticmethod
    def normalize_dense(dense_adj, add_self_loops: bool = True,
                        normalize: bool = True):
        """Precompute the layer-independent normalized adjacency + the
        self-loop diagonal ONCE per forward: every GCN layer of a stack
        re-deriving them materializes a fresh [G, S, S] array per layer
        (~95 MB of HBM traffic on a 5-layer molecular step)."""
        adj = dense_adj
        deg = jnp.sum(adj, axis=-1)
        if add_self_loops:
            deg = deg + 1.0
        inv = jnp.where(deg > 0,
                        jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        if normalize:
            adj = adj * inv[:, :, None] * inv[:, None, :]
        diag = (inv * inv) if (add_self_loops and normalize) else None
        return adj, diag

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask,
                 edge_weight=None, num_nodes=None, dense_adj=None,
                 plan=None, dense_pre_normalized: bool = False,
                 dense_diag=None):
        n = num_nodes or x.shape[0]
        w = self.param("kernel", glorot, (x.shape[-1], self.features))
        x, w = nn.dtypes.promote_dtype(x, w, dtype=self.dtype)
        h = x @ w
        if dense_adj is not None:
            dense_adj = dense_adj.astype(h.dtype)
            # Slotted dense path: batched MXU matmul with in-degree
            # normalization — algebraically identical to the sparse path.
            if dense_pre_normalized:
                adj = dense_adj
                diag_b = (dense_diag.astype(h.dtype)
                          if dense_diag is not None else None)
            else:
                adj, diag_b = self.normalize_dense(
                    dense_adj, self.add_self_loops, self.normalize)
            hb = _to_blocks(h, adj.shape[-1])[:adj.shape[0]]
            outb = jnp.einsum("gij,gjf->gif", adj, hb)
            if diag_b is not None:
                outb = outb + diag_b[:, :, None] * hb
            out = _from_blocks(outb)
            out = jnp.pad(out, ((0, n - out.shape[0]), (0, 0)))
        else:
            if self.normalize:
                # Weighted degree when edge_weight is given (PyG gcn_norm
                # computes deg from the edge weights, not the edge count).
                norm_w, diag = gcn_norm_weights(
                    senders, receivers, edge_mask, n,
                    add_self_loops=self.add_self_loops,
                    edge_weight=edge_weight)
            else:
                norm_w = jnp.where(
                    edge_mask,
                    edge_weight if edge_weight is not None else 1.0, 0.0)
                diag = None
            out = gather_scatter(h, senders, receivers, num_nodes=n,
                                 edge_weight=norm_w.astype(h.dtype),
                                 plan=plan)
            if diag is not None:
                out = out + diag.astype(h.dtype)[:, None] * h
        if self.use_bias:
            b = self.param("bias", zeros, (self.features,))
            out = out + b.astype(out.dtype)
        return out


class GraphConv(nn.Module):
    """PyG GraphConv (Weisfeiler-Leman):
        X'_i = W_root x_i + W_rel (sum_j w_ij x_j) + b
    with add-aggregation and optional per-edge weights
    (used by the SCN clustering stack, reference hscn.py:30-45).
    """

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask,
                 edge_weight=None, num_nodes=None, self_weight=None,
                 dense_adj=None, plan=None):
        n = num_nodes or x.shape[0]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            if dense_adj is not None:
                dense_adj = dense_adj.astype(self.dtype)
            if edge_weight is not None:
                edge_weight = edge_weight.astype(self.dtype)
            if self_weight is not None:
                self_weight = self_weight.astype(self.dtype)
        if dense_adj is not None:
            # Dense path: dense_adj must already carry the desired edge
            # weights; self_weight (if given) is flat [N].
            xb = _to_blocks(x, dense_adj.shape[-1])[:dense_adj.shape[0]]
            aggb = jnp.einsum("gij,gjf->gif", dense_adj, xb)
            agg = _from_blocks(aggb)
            agg = jnp.pad(agg, ((0, n - agg.shape[0]), (0, 0)))
            if self_weight is not None:
                agg = agg + self_weight[:, None] * x
        else:
            w_eff = edge_weight if edge_weight is not None else jnp.ones(
                senders.shape, x.dtype)
            w_eff = jnp.where(edge_mask, w_eff, 0.0)
            agg = gather_scatter(x, senders, receivers, num_nodes=n,
                                 edge_weight=w_eff, plan=plan)
            if self_weight is not None:
                # Self-loop contribution routed through the neighbor
                # transform, matching gcn_norm's materialized self-loop
                # edges feeding GraphConv in the reference
                # (train_clustering.py:37-47).
                agg = agg + self_weight[:, None] * x
        w_rel = self.param("kernel_rel", glorot, (x.shape[-1], self.features))
        w_root = self.param("kernel_root", glorot,
                            (x.shape[-1], self.features))
        agg, x, w_rel, w_root = nn.dtypes.promote_dtype(
            agg, x, w_rel, w_root, dtype=self.dtype)
        out = agg @ w_rel + x @ w_root
        if self.use_bias:
            b = self.param("bias", zeros, (self.features,))
            out = out + b.astype(out.dtype)
        return out


class GINConv(nn.Module):
    """GIN:  X'_i = MLP((1 + eps) x_i + sum_j x_j).

    The reference's CONV_DICT contains GINConv but its construction signature
    is incompatible with channel dims (SURVEY quirk #11 — PyG GINConv takes an
    nn module) so the reference cannot actually run GIN; here we accept
    channel dims and build the conventional 2-layer MLP, making GIN usable.
    """

    features: int
    train_eps: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask,
                 edge_weight=None, num_nodes=None, dense_adj=None,
                 plan=None):
        n = num_nodes or x.shape[0]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            if dense_adj is not None:
                dense_adj = dense_adj.astype(self.dtype)
            if edge_weight is not None:
                edge_weight = edge_weight.astype(self.dtype)
        if dense_adj is not None:
            xb = _to_blocks(x, dense_adj.shape[-1])[:dense_adj.shape[0]]
            agg = _from_blocks(jnp.einsum("gij,gjf->gif", dense_adj, xb))
            agg = jnp.pad(agg, ((0, n - agg.shape[0]), (0, 0)))
        else:
            w_eff = jnp.where(edge_mask, 1.0, 0.0)
            if edge_weight is not None:
                w_eff = w_eff * edge_weight
            agg = gather_scatter(x, senders, receivers, num_nodes=n,
                                 edge_weight=w_eff, plan=plan)
        eps = (self.param("eps", zeros, ()) if self.train_eps else 0.0)
        h = (1.0 + jnp.asarray(eps, x.dtype)) * x + agg
        h = nn.Dense(self.features, kernel_init=glorot,
                     dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(self.features, kernel_init=glorot,
                     dtype=self.dtype)(h)
        return h


class GATConv(nn.Module):
    """PyG GATConv (heads H, concat):
        h_i = W x_i                       (per head)
        e_ij = LeakyReLU(a_src . h_j + a_dst . h_i, slope=0.2)
        alpha_ij = softmax_{j in N(i)} e_ij      (over incoming edges)
        X'_i = sum_j alpha_ij h_j  (+ bias)
    With ``add_self_loops`` a self-edge participates in each node's softmax
    (PyG default True; HSCN builds it with False, reference hscn.py:117-125).

    For bipartite use (local->virtual relation) pass ``x_dst`` — separate
    source/target projections, matching PyG's (-1, -1) lazy bipartite mode.
    """

    features: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    add_self_loops: bool = True
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask,
                 edge_weight=None, num_nodes=None, x_dst=None,
                 num_dst_nodes=None, dense_adj=None, plan=None):
        H, C = self.heads, self.features
        bipartite = x_dst is not None
        n_dst = (num_dst_nodes or (x_dst.shape[0] if bipartite
                                   else (num_nodes or x.shape[0])))

        w_src = self.param("kernel_src", glorot, (x.shape[-1], H * C))
        x, w_src = nn.dtypes.promote_dtype(x, w_src, dtype=self.dtype)
        h_src = (x @ w_src).reshape(-1, H, C)
        if bipartite:
            w_dst = self.param("kernel_dst", glorot, (x_dst.shape[-1], H * C))
            x_dst, w_dst = nn.dtypes.promote_dtype(x_dst, w_dst,
                                                   dtype=self.dtype)
            h_dst = (x_dst @ w_dst).reshape(-1, H, C)
        else:
            h_dst = h_src

        att_src = self.param("att_src", glorot, (1, H, C))
        att_dst = self.param("att_dst", glorot, (1, H, C))
        att_src = att_src.astype(h_src.dtype)
        att_dst = att_dst.astype(h_src.dtype)

        if dense_adj is not None and not bipartite:
            # Slotted dense path: masked dense attention per graph block.
            if edge_weight is not None:
                # The dense branch derives connectivity from dense_adj and
                # never consults per-edge weights; refuse rather than
                # silently drop them (no in-repo caller passes weighted
                # GAT — route via the sparse path if one ever does).
                raise ValueError(
                    "GATConv dense-slotted path does not support "
                    "edge_weight; pass dense_adj=None to use the sparse "
                    "path")
            G, S, _ = dense_adj.shape
            hb = h_src.reshape(G, S, H, C)
            a_s = jnp.sum(hb * att_src[None], axis=-1)     # [G, S, H]
            a_d = jnp.sum(hb * att_dst[None], axis=-1)
            # scores[g, i, j, h] for edge j -> i.
            e = a_s[:, None, :, :] + a_d[:, :, None, :]
            e = nn.leaky_relu(e, self.negative_slope)
            conn = dense_adj > 0                           # [G, S, S]
            if self.add_self_loops:
                eye = jnp.eye(S, dtype=bool)
                conn = conn | eye[None]
            e = jnp.where(conn[..., None], e, -jnp.inf)
            m = jnp.max(e, axis=2, keepdims=True)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            ex = jnp.where(conn[..., None], jnp.exp(e - m), 0.0)
            denom = jnp.maximum(jnp.sum(ex, axis=2, keepdims=True), 1e-16)
            alpha = ex / denom                             # [G, S, S, H]
            out = jnp.einsum("gijh,gjhc->gihc", alpha, hb)
            out = out.reshape(n_dst, H, C)
            out = (out.reshape(n_dst, H * C) if self.concat
                   else out.mean(axis=1))
            if self.use_bias:
                dim = H * C if self.concat else C
                b = self.param("bias", zeros, (dim,))
                out = out + b.astype(out.dtype)
            return out
        a_src = jnp.sum(h_src * att_src, axis=-1)   # [N_src, H]
        a_dst = jnp.sum(h_dst * att_dst, axis=-1)   # [N_dst, H]

        use_kernels = plan is not None and not bipartite and pallas_enabled()
        if use_kernels:
            # Forward attention logits as ONE blocked-SDDMM launch
            # (ops/pallas/multihead_kernel.gat_edge_logits) instead of two
            # XLA [E, H] row-at-a-time gathers; masked slots return 0 and
            # are re-masked downstream exactly like the gather path.
            from graph_hscn_tpu.ops.pallas.multihead_kernel import \
                gat_edge_logits
            E = senders.shape[0]
            e = gat_edge_logits(a_src, a_dst, plan)[:E]
        else:
            e = a_src[senders] + a_dst[receivers]   # [E, H]
        e = nn.leaky_relu(e, self.negative_slope)

        def aggregate(alpha):
            """sum_j alpha_ij h_j per head.  With a batch-attached SpMM
            plan on the Pallas backend ALL heads run in one fused
            windowed-one-hot MXU kernel launch (spmm_mh) — no [E, H, C]
            message materialization, d(alpha) via the blocked SDDMM in
            its custom VJP.  H separate launches were measured re-staging
            the same x windows (VERDICT round-2 item 2)."""
            if use_kernels:
                from graph_hscn_tpu.ops.pallas.multihead_kernel import \
                    spmm_mh
                out = spmm_mh(h_src.reshape(-1, H * C), alpha, plan,
                              heads=H, num_nodes=n_dst)
                return out.reshape(n_dst, H, C).astype(h_src.dtype)
            msgs = h_src[senders] * alpha[..., None]
            return segment_sum(msgs, receivers, n_dst,
                               indices_are_sorted=True)

        if self.add_self_loops and not bipartite:
            # Self edge for every node: logits a_src[i] + a_dst[i].
            # Softmax over {incoming edges} U {self}: compute via shifted
            # exponentials sharing one max.
            self_e = nn.leaky_relu(a_src + a_dst, self.negative_slope)  # [N,H]
            e_masked = jnp.where(edge_mask[:, None], e, -jnp.inf)
            seg_max = jax.ops.segment_max(e_masked, receivers, n_dst,
                                          indices_are_sorted=True)
            m = jnp.maximum(jnp.where(jnp.isfinite(seg_max), seg_max, -jnp.inf),
                            self_e)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            # stop_gradient on the max-shift is EXACT (the softmax value
            # is invariant to the shift, so its total gradient is zero —
            # same trick as jax.nn.softmax; it must cover ALL uses of m,
            # exp_e AND exp_self, for the cancellation to hold) and it
            # skips the shift-sddmm's VJP launches on the kernel path.
            m = jax.lax.stop_gradient(m)
            if use_kernels:
                # The max-shift per edge via the blocked SDDMM (one
                # launch) instead of an [E, H] row-at-a-time gather.
                m_e = gat_edge_logits(jnp.zeros_like(m), m, plan)[:E]
            else:
                m_e = m[receivers]
            exp_e = jnp.where(edge_mask[:, None],
                              jnp.exp(e - m_e), 0.0)
            exp_self = jnp.exp(self_e - m)
            denom = segment_sum(exp_e, receivers, n_dst,
                                indices_are_sorted=True) + exp_self
            if use_kernels:
                # Divide AFTER aggregation: out_i = (1/denom_i) *
                # sum_e exp_e x_send — a node-level scale instead of the
                # denom[receivers] [E, H] gather.  Same math, fewer
                # gathers; the self term shares the scale.
                inv = 1.0 / jnp.maximum(denom, 1e-16)
                out = aggregate(exp_e) * inv[..., None]
                out = out + h_dst * (exp_self * inv)[..., None]
            else:
                alpha = exp_e / jnp.maximum(denom[receivers], 1e-16)
                alpha_self = exp_self / jnp.maximum(denom, 1e-16)
                out = aggregate(alpha)
                out = out + h_dst * alpha_self[..., None]
        else:
            if use_kernels:
                e_masked = jnp.where(edge_mask[:, None], e, -jnp.inf)
                m = jax.ops.segment_max(e_masked, receivers, n_dst,
                                        indices_are_sorted=True)
                m = jnp.where(jnp.isfinite(m), m, 0.0)
                m = jax.lax.stop_gradient(m)   # exact: shift-invariant
                m_e = gat_edge_logits(jnp.zeros_like(m), m, plan)[:E]
                exp_e = jnp.where(edge_mask[:, None], jnp.exp(e - m_e),
                                  0.0)
                denom = segment_sum(exp_e, receivers, n_dst,
                                    indices_are_sorted=True)
                inv = 1.0 / jnp.maximum(denom, 1e-16)
                out = aggregate(exp_e) * inv[..., None]
            else:
                alpha = segment_softmax(e, receivers, n_dst,
                                        indices_are_sorted=True,
                                        mask=edge_mask[:, None])
                out = aggregate(alpha)

        out = (out.reshape(n_dst, H * C) if self.concat
               else out.mean(axis=1))
        if self.use_bias:
            dim = H * C if self.concat else C
            b = self.param("bias", zeros, (dim,))
            out = out + b.astype(out.dtype)
        return out


class GatedGCNConv(nn.Module):
    """GatedGCN (Bresson & Laurent; the LRGB baseline layer — required by
    BASELINE.json configs, absent from the reference's CONV_DICT):

        e'_ij = C e_ij + D x_i + E x_j
        eta_ij = sigmoid(e'_ij) / (sum_{j'} sigmoid(e'_ij') + eps)
        x'_i = A x_i + sum_j eta_ij * (B x_j)
    with optional residual + BatchNorm-free LayerNorm variant (we use
    LayerNorm for TPU-friendliness; flag selects none).
    Returns (x', e') — edge features are updated too.
    """

    features: int
    residual: bool = True
    norm: str = "layer"   # "layer" | "none"
    eps: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x, edge_feat, senders, receivers, edge_mask,
                 num_nodes=None, train: bool = True, plan=None):
        from graph_hscn_tpu.ops.segment import (gather_planned,
                                                segment_sum_planned)
        n = num_nodes or x.shape[0]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            edge_feat = edge_feat.astype(self.dtype)
        A = nn.Dense(self.features, kernel_init=glorot, dtype=self.dtype)
        B = nn.Dense(self.features, kernel_init=glorot, dtype=self.dtype)
        C = nn.Dense(self.features, kernel_init=glorot, dtype=self.dtype)
        D = nn.Dense(self.features, kernel_init=glorot, dtype=self.dtype)
        E = nn.Dense(self.features, kernel_init=glorot, dtype=self.dtype)

        # Scatters dominate this layer on TPU (measured ~130 us per
        # [E, F] -> [N, F] pass vs ~28 us per gather at molecular scale).
        # With a batch plan, BOTH the forward segment-sums and the
        # gathers' backward scatter-adds ride the windowed one-hot
        # segment-reduce kernel; gather_planned's contract (zero
        # cotangents on masked edges) is met by masking e_new below.
        e_new = (C(edge_feat) + gather_planned(D(x), receivers, plan=plan)
                 + gather_planned(E(x), senders, plan=plan, side="sender"))
        sig = jax.nn.sigmoid(e_new)
        sig = jnp.where(edge_mask[:, None], sig, 0.0)
        denom = segment_sum_planned(sig, receivers, n, plan=plan)
        msgs = sig * gather_planned(B(x), senders, plan=plan,
                                    side="sender")
        agg = segment_sum_planned(msgs, receivers, n, plan=plan)
        x_new = A(x) + agg / (denom + self.eps)

        if self.norm == "layer":
            x_new = nn.LayerNorm(dtype=self.dtype)(x_new)
            e_new = nn.LayerNorm(dtype=self.dtype)(e_new)
        x_new = nn.relu(x_new)
        e_new = nn.relu(e_new)
        if self.residual and x.shape[-1] == self.features:
            x_new = x + x_new
        if self.residual and edge_feat.shape[-1] == self.features:
            e_new = edge_feat + e_new
        # Padding hygiene (and the gather_planned VJP contract): padded
        # edge rows out as zeros, like every other layer's node rows.
        e_new = jnp.where(edge_mask[:, None], e_new, 0.0)
        return x_new, e_new


ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "elu": nn.elu,
    "tanh": jnp.tanh,
    "gelu": nn.gelu,
    "identity": lambda x: x,
}


class MLP(nn.Module):
    """Plain MLP head."""

    features: Sequence[int]
    activation: Callable = nn.relu
    final_activation: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=glorot, dtype=self.dtype)(x)
            if i < len(self.features) - 1 or self.final_activation:
                x = self.activation(x)
        return x
