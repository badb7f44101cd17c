"""HSCN — heterogeneous virtual-node convolution network
(reference hscn.py:67-140).

TPU-native redesign.  The reference materializes a PyG ``HeteroData`` per
graph with Python loops (hetero_data.py:42-87) and runs ``HeteroConv`` over
three relations.  Here no hetero object ever exists: virtual nodes live in a
dense ``[G*K, H]`` array addressed by ``vid = graph_id * K + cluster`` and
the three relations become three tensor programs per layer:

  local->local   GCNConv (add_self_loops=False) on the original CSR edges —
                 sparse path (reference hscn.py:117-125, ll GCN).
  local->virtual GAT bipartite attention: each real node attends to its
                 cluster's virtual node; softmax is a segment-softmax over
                 cluster members (reference lv GAT, the "must be GAT" slot).
  virtual->virtual dense conv over a per-graph K x K adjacency — a batched
                 MXU matmul (reference vv GCN over the virtual "clique").

HeteroConv aggr="sum" semantics (reference hscn.py:82-97): destination type
"local" receives only ll; "virtual" receives lv + vv.  ReLU after every
layer for both types (hscn.py:110), mean-pool over local nodes + 2-layer
head (hscn.py:111-113).

Virtual topology: the reference's virtual-virtual edge pattern is NOT a
clique — it's the triangular set {(i,j): i+j < num_active} including some
self-loops (quirk #9, hetero_data.py:68-79).  ``vv_pattern="triangular"``
reproduces it; "clique" (default "triangular" for parity) uses the full
directed clique without self-loops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.models.layers import (ACTIVATIONS, GATConv, GCNConv,
                                          glorot, zeros)
from graph_hscn_tpu.ops.segment import (graph_readout_mean, segment_mean,
                                        segment_softmax, segment_sum)


def virtual_node_features(batch: GraphBatch, num_clusters: int,
                          index_shift: bool = False):
    """Initial virtual-node features: per-(graph, cluster) mean of member
    node features (reference hetero_data.py:56-59).

    Returns (x_v [G*K, F], v_active [G*K] bool, vid [N] int32).
    ``index_shift`` reproduces quirk #8 EXACTLY (features rotated one
    cluster down relative to the l->v edge targets): the reference first
    compacts each graph's occupied clusters with np.unique
    (hetero_data.py:46-51) and then rotates in that COMPACTED space
    (``clusters[ix] - 1`` with Python negative-index wrap over the
    length-U list, :53-54), so a node in the cluster of compacted rank r
    contributes its features to the active cluster of rank (r-1) mod U —
    the cyclically-previous OCCUPIED cluster, not (c-1) mod K.
    """
    K = num_clusters
    G = batch.num_graphs_padded
    vid = batch.node_graph * K + batch.cluster
    if index_shift:
        # Per-graph occupancy -> compacted ranks -> cyclic-previous
        # active cluster id per slot.
        ones_occ = batch.node_mask.astype(jnp.int32)
        occ = segment_sum(ones_occ, vid, G * K).reshape(G, K) > 0  # [G, K]
        occ_i = occ.astype(jnp.int32)
        rank = jnp.cumsum(occ_i, axis=1) - 1               # [G, K]
        U = jnp.sum(occ_i, axis=1)                         # [G]
        # order[g, r] = id of the active cluster with rank r (ascending);
        # inactive slots sort to the back.
        sort_key = jnp.where(occ, jnp.arange(K)[None, :], K)
        order = jnp.argsort(sort_key, axis=1)              # [G, K]
        prev_rank = jnp.mod(rank - 1, jnp.maximum(U, 1)[:, None])
        prev_id = jnp.take_along_axis(order, prev_rank, axis=1)  # [G, K]
        feat_cluster = prev_id[batch.node_graph, batch.cluster]
    else:
        feat_cluster = batch.cluster
    feat_vid = batch.node_graph * K + feat_cluster
    ones = batch.node_mask.astype(batch.node_feat.dtype)
    count = segment_sum(ones, vid, G * K)
    x_masked = jnp.where(batch.node_mask[:, None], batch.node_feat, 0.0)
    x_v = segment_sum(x_masked, feat_vid, G * K)
    feat_count = segment_sum(ones, feat_vid, G * K)
    x_v = x_v / jnp.maximum(feat_count, 1.0)[:, None]
    graph_real = jnp.repeat(batch.graph_mask, K)
    v_active = (count > 0) & graph_real
    return x_v, v_active, vid


def _vv_adjacency(v_active, num_graphs: int, num_clusters: int,
                  pattern: str, dtype):
    """Per-graph K x K virtual adjacency A[g, dst, src].

    "clique": all-to-all among active clusters, no self loops.
    "triangular": reference parity (quirk #9) — pairs of *compacted* active
    positions (p_src, p_dst) with p_src + p_dst < num_active (self-loops
    where 2p < num_active included).
    """
    K = num_clusters
    act = v_active.reshape(num_graphs, K).astype(dtype)
    if pattern == "clique":
        eye = jnp.eye(K, dtype=dtype)
        a = act[:, :, None] * act[:, None, :] * (1.0 - eye)
        return a
    # Compacted position of each active slot: rank among active clusters.
    pos = jnp.cumsum(act, axis=1) - 1.0          # [G, K]
    num_active = jnp.sum(act, axis=1)            # [G]
    p_sum = pos[:, :, None] + pos[:, None, :]    # [G, dst, src]
    ok = (p_sum < num_active[:, None, None])
    a = jnp.where(ok, 1.0, 0.0) * act[:, :, None] * act[:, None, :]
    return a


class DenseGCN(nn.Module):
    """GCNConv on a dense batched adjacency (the vv relation):
    out = D^-1/2 A D^-1/2 (X W) + b, in-degree normalization, no added
    self-loops — matching PyG GCNConv(add_self_loops=False) semantics."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, adj):
        # adj: [G, K, K] with adj[g, dst, src]; in-degree = row-sum.
        deg_in = jnp.sum(adj, axis=-1)
        inv = jnp.where(deg_in > 0, jax.lax.rsqrt(jnp.maximum(deg_in, 1e-12)),
                        0.0)
        a_norm = adj * inv[:, :, None] * inv[:, None, :]
        w = self.param("kernel", glorot, (x.shape[-1], self.features))
        x, w, a_norm = nn.dtypes.promote_dtype(x, w, a_norm,
                                               dtype=self.dtype)
        out = jnp.einsum("gkj,gjf->gkf", a_norm, x @ w)
        b = self.param("bias", zeros, (self.features,))
        return out + b.astype(out.dtype)


class DenseGAT(nn.Module):
    """GATConv on a dense batched adjacency (vv relation alternative; PyG
    semantics with add_self_loops=False).  ``heads > 1`` concatenates H
    heads of ``features`` channels each (PyG concat=True)."""

    features: int
    heads: int = 1
    negative_slope: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, adj):
        H, C = self.heads, self.features
        w = self.param("kernel_src", glorot, (x.shape[-1], H * C))
        x, w = nn.dtypes.promote_dtype(x, w, dtype=self.dtype)
        G, K = x.shape[0], x.shape[1]
        h = (x @ w).reshape(G, K, H, C)             # [G, K, H, C]
        att_src = self.param("att_src", glorot, (1, 1, H, C))
        att_dst = self.param("att_dst", glorot, (1, 1, H, C))
        att_src = att_src.astype(h.dtype)
        att_dst = att_dst.astype(h.dtype)
        a_s = jnp.sum(h * att_src, axis=-1)         # [G, K, H]
        a_d = jnp.sum(h * att_dst, axis=-1)
        e = a_s[:, None, :, :] + a_d[:, :, None, :]  # [G, dst, src, H]
        e = nn.leaky_relu(e, self.negative_slope)
        conn = (adj > 0)[..., None]
        e = jnp.where(conn, e, -jnp.inf)
        m = jnp.max(e, axis=2, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        ex = jnp.where(conn, jnp.exp(e - m), 0.0)
        denom = jnp.maximum(jnp.sum(ex, axis=2, keepdims=True), 1e-16)
        alpha = ex / denom                          # [G, dst, src, H]
        out = jnp.einsum("gijh,gjhc->gihc", alpha, h).reshape(G, K, H * C)
        b = self.param("bias", zeros, (H * C,))
        return out + b.astype(out.dtype)


class HSCN(nn.Module):
    lv_conv: str
    ll_conv: str
    vv_conv: str
    activation: str
    hidden_channels: int
    num_classes: int
    num_layers: int
    num_clusters: int
    num_heads: int = 1               # GAT relation slots; hidden % heads == 0
    vv_pattern: str = "triangular"   # reference parity (quirk #9)
    index_shift: bool = False        # quirk #8 off by default
    # Opt-in virtual->local feedback (quirk #17): the reference's relation
    # set has no v->l edge type and its head pools only local nodes, so
    # the virtual pathway cannot reach the output (proven by execution,
    # tests/test_ref_shim.py::test_reference_virtual_pathway_inert).
    # With feedback on, each local node also receives a projection of its
    # cluster's virtual state (HeteroConv aggr="sum" semantics) — the
    # hierarchical long-range channel the architecture describes.
    virtual_feedback: bool = False
    readout: str = "mean"
    dtype: Any = None                # bf16 compute (params/logits stay f32)

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = True):
        assert batch.cluster is not None, "HSCN needs cluster assignments"
        K = self.num_clusters
        G = batch.num_graphs_padded
        N = batch.num_nodes_padded
        act = ACTIVATIONS[self.activation.lower()]
        # Multi-head GAT slots: H heads of hidden/H channels, concatenated
        # back to hidden (PyG concat=True convention, as in MPNNConfig).
        gat_heads = self.num_heads
        gat_feat = self.hidden_channels // gat_heads

        from graph_hscn_tpu.ops.dense import resolve_dense_adj
        dense_adj = resolve_dense_adj(batch)
        x_l = batch.node_feat
        x_v, v_active, vid = virtual_node_features(
            batch, K, index_shift=self.index_shift)
        adj_vv = _vv_adjacency(v_active, G, K, self.vv_pattern, x_l.dtype)

        for _l in range(self.num_layers):
            # local <- local (reference hscn.py:121, add_self_loops=False;
            # conv type per config — GCN default, GAT supported).
            if self.ll_conv.upper() == "GAT":
                ll = GATConv(features=gat_feat, heads=gat_heads,
                             add_self_loops=False, dtype=self.dtype)
                x_l_new = ll(x_l, batch.senders, batch.receivers,
                             batch.edge_mask, num_nodes=N,
                             dense_adj=dense_adj)
            else:
                ll = GCNConv(features=self.hidden_channels,
                             add_self_loops=False, dtype=self.dtype)
                x_l_new = ll(x_l, batch.senders, batch.receivers,
                             batch.edge_mask, num_nodes=N,
                             dense_adj=dense_adj, plan=batch.spmm)

            # virtual <- local (bipartite GAT — the only lazily-inferable
            # bipartite conv, reference's "must be GAT" slot,
            # config.py:80).
            lv = GATConv(features=gat_feat, heads=gat_heads,
                         add_self_loops=False, dtype=self.dtype)
            lv_out = lv(x_l, jnp.arange(N, dtype=jnp.int32), vid,
                        batch.node_mask, x_dst=x_v, num_dst_nodes=G * K)

            # virtual <- virtual (dense batched conv on the K x K pattern;
            # conv type per config).
            if self.vv_conv.upper() == "GAT":
                vv = DenseGAT(features=gat_feat, heads=gat_heads,
                              dtype=self.dtype)
            else:
                vv = DenseGCN(features=self.hidden_channels,
                              dtype=self.dtype)
            vv_out = vv(x_v.reshape(G, K, -1), adj_vv).reshape(G * K, -1)

            # HeteroConv aggr="sum" + per-type ReLU (hscn.py:97,110).
            if self.virtual_feedback:
                # virtual -> local: each node gathers its cluster's
                # virtual state through a linear map (bipartite conv with
                # in-degree 1 per local node; no normalization needed).
                # Replicated virtual nodes make this communication-free
                # on edge-partitioned meshes.  ZERO-init: at init the
                # model equals the reference-faithful one exactly and
                # training grows the channel only where it helps (a
                # glorot-init feedback measurably hurt — random virtual
                # projections wash out the local stream; see
                # artifacts/VFB_STUDY_R5.json ablation).
                vl = nn.Dense(self.hidden_channels, kernel_init=zeros,
                              bias_init=zeros, dtype=self.dtype,
                              name=f"VLDense_{_l}")
                x_l_new = x_l_new + vl(x_v)[vid]
            x_l = nn.relu(x_l_new)
            x_v = nn.relu(lv_out + vv_out)
            x_v = jnp.where(v_active[:, None], x_v, 0.0)

        x_l = jnp.where(batch.node_mask[:, None], x_l,
                        0.0).astype(jnp.float32)
        if self.readout == "none":
            h = act(nn.Dense(self.hidden_channels, kernel_init=glorot)(x_l))
            return nn.Dense(self.num_classes, kernel_init=glorot)(h)
        pooled = graph_readout_mean(x_l, batch.node_graph, G)
        h = act(nn.Dense(self.hidden_channels, kernel_init=glorot)(pooled))
        return nn.Dense(self.num_classes, kernel_init=glorot)(h)


def build_hscn(model_cfg, num_classes: int, compat_triangular: bool = True,
               compat_index_shift: bool = False,
               readout: str = "mean", dtype=None) -> HSCN:
    """Mirror of reference build_hscn (hscn.py:128-140)."""
    return HSCN(
        lv_conv=model_cfg.lv_conv_type,
        ll_conv=model_cfg.ll_conv_type,
        vv_conv=model_cfg.vv_conv_type,
        activation=model_cfg.activation,
        hidden_channels=model_cfg.hidden_channels,
        num_classes=num_classes,
        num_layers=model_cfg.num_layers,
        num_clusters=model_cfg.num_clusters,
        num_heads=getattr(model_cfg, "num_heads", 1),
        vv_pattern="triangular" if compat_triangular else "clique",
        index_shift=compat_index_shift,
        virtual_feedback=getattr(model_cfg, "virtual_feedback", False),
        readout=readout,
        dtype=dtype,
    )
