"""Edge-partitioned HSCN: virtual-node hetero convolution for a single
giant graph sharded across a device mesh (ROADMAP item: HSCN virtual nodes
in the sharded path; extends parallel/sharded_gcn.py with the three HSCN
relations of models/hscn.py, reference hscn.py:67-140).

Layout:
  local nodes    contiguous blocks per device (parallel/edge_partition.py),
                 local->local edges owned by the receiver, halo all_to_all
                 of boundary features per layer (overlapped with the local
                 aggregation exactly like sharded_gcn).
  virtual nodes  K cluster rows REPLICATED on every device: K is small, so
                 the l->v contraction is computed as a local segment-sum
                 over each device's members followed by a psum — the pooled
                 S^T X pattern of the MinCUT contractions — and the l->v
                 attention softmax is a global segment-softmax realized
                 with pmax (max) + psum (denominator), all K-sized
                 collectives over ICI.
  v->v           dense K x K conv, computed redundantly on every device
                 (cheaper than communicating it).

Per-layer semantics match models/hscn.py exactly (ll GCNConv with
add_self_loops=False, bipartite single-head GAT for l->v, DenseGCN on the
active-cluster pattern for v->v, HeteroConv sum + per-type ReLU);
tests/test_sharded_hscn.py asserts allclose against the flax HSCN with
mapped weights on the 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_hscn_tpu.models.hscn import _vv_adjacency
from graph_hscn_tpu.ops.segment import segment_sum

_SLOPE = 0.2   # GAT LeakyReLU slope (PyG default, models/layers.py)

_PLAN_KEYS = ("send_idx", "snd_loc", "rcv_loc", "mask_loc",
              "snd_hal", "rcv_hal", "mask_hal")


def init_sharded_hscn_params(rng, num_features: int, hidden: int,
                             num_classes: int, num_layers: int,
                             heads: int = 1,
                             virtual_feedback: bool = False) -> dict:
    """Parameter pytree mirroring the flax HSCN's per-layer modules.

    ``heads``: multi-head lv attention (models/hscn.py ``num_heads``
    semantics) — H heads of hidden // H channels each, concatenated;
    att_src/att_dst are [H, C] like flax GATConv's (1, H, C) squeezed.
    ``virtual_feedback`` adds the per-layer v->l projection (quirk #17
    extension, models/hscn.py ``virtual_feedback``)."""
    assert hidden % heads == 0, "hidden must be divisible by heads"
    C = hidden // heads

    def glorot(key, shape):
        scale = jnp.sqrt(6.0 / (shape[0] + shape[1]))
        return jax.random.uniform(key, shape, minval=-scale, maxval=scale)

    def att(key):
        scale = jnp.sqrt(6.0 / (1 + C))
        return jax.random.uniform(key, (heads, C), minval=-scale,
                                  maxval=scale)

    layers = []
    f_in = num_features
    for _ in range(num_layers):
        rng, k1, k2, k3, k4, k5, k6, k7 = jax.random.split(rng, 8)
        layer = {
            "ll": {"kernel": glorot(k1, (f_in, hidden)),
                   "bias": jnp.zeros((hidden,))},
            "lv": {"kernel_src": glorot(k2, (f_in, hidden)),
                   "kernel_dst": glorot(k3, (f_in, hidden)),
                   "att_src": att(k4),
                   "att_dst": att(k5),
                   "bias": jnp.zeros((hidden,))},
            "vv": {"kernel": glorot(k6, (f_in, hidden)),
                   "bias": jnp.zeros((hidden,))},
        }
        if virtual_feedback:
            # ZERO-init (models/hscn.py VLDense): the feedback channel
            # starts as the identity-to-reference model and is grown by
            # training only where it helps.
            del k7  # key reserved to keep the other draws stable
            layer["vl"] = {"kernel": jnp.zeros((f_in, hidden)),
                           "bias": jnp.zeros((hidden,))}
        layers.append(layer)
        f_in = hidden
    rng, k1, k2 = jax.random.split(rng, 3)
    head = {
        "h1": {"kernel": glorot(k1, (hidden, hidden)),
               "bias": jnp.zeros((hidden,))},
        "h2": {"kernel": glorot(k2, (hidden, num_classes)),
               "bias": jnp.zeros((num_classes,))},
    }
    return {"layers": layers, "head": head}


def make_sharded_hscn(mesh: Mesh, num_clusters: int,
                      vv_pattern: str = "triangular", axis: str = "data",
                      heads: int = 1, use_spmm_plan: bool = False,
                      dtype=None):
    """Builds (forward, value_and_grad) for the sharded HSCN.

    forward(params, x_blocks [D,Nb,F], mask_blocks [D,Nb],
            cluster_blocks [D,Nb], plan) -> logits [D,Nb,C]
    value_and_grad adds y_blocks/node_ok_blocks and returns psum'd loss
    and replicated grads (node-level cross entropy, same as sharded_gcn).

    ``heads``: multi-head lv attention — per-head global segment softmax
    over each cluster's members ([K, H] pmax/psum collectives instead of
    [K]), H concatenated heads of hidden // H channels (VERDICT round-2
    item 3: parity with models/hscn.py ``num_heads``).

    ``use_spmm_plan``: the plan dict carries ``spmm_loc`` (stacked
    per-device Pallas plans, edge_partition.local_spmm_plans); the ll
    local-sender aggregation — the flagship relation, reference
    hscn.py:67-140 — then rides the fused windowed one-hot MXU SpMM
    while the halo all_to_all is in flight, exactly like sharded_gcn
    (VERDICT round-3 item 2).  The K-segment lv/vv contractions stay
    XLA: their segment ids are cluster assignments (unsorted, K-sized),
    outside the receiver-sorted regime the kernel plans require.

    ``dtype`` (e.g. jnp.bfloat16): mixed precision — local/virtual
    streams and the per-layer halo payload run in ``dtype`` (f32 master
    params); the lv attention logits, the global segment softmax
    (pmax/psum statistics), and the logits stay f32, mirroring
    make_sharded_gat.
    """
    from graph_hscn_tpu.parallel.sharded_gcn import _make_local_agg
    K = num_clusters
    H = heads
    n_extra = 1 if use_spmm_plan else 0

    def _halo(x_blk, send_idx):
        outbound = jnp.take(x_blk, send_idx, axis=0)
        inbound = jax.lax.all_to_all(outbound, axis, split_axis=0,
                                     concat_axis=0, tiled=False)
        return inbound.reshape(-1, x_blk.shape[-1])

    def per_device_forward(params, x_blk, mask_blk, clust_blk, send_idx,
                           snd_loc, rcv_loc, m_loc, snd_hal, rcv_hal,
                           m_hal, *sp):
        x = x_blk[0]
        mask = mask_blk[0]
        clust = clust_blk[0]
        send_idx = send_idx[0]
        snd_loc, rcv_loc, m_loc = snd_loc[0], rcv_loc[0], m_loc[0]
        snd_hal, rcv_hal, m_hal = snd_hal[0], rcv_hal[0], m_hal[0]
        nb = x.shape[0]
        # Degree weights are structural: the kernel VJP skips its dw SDDMM.
        local_agg = _make_local_agg(sp, snd_loc, rcv_loc, nb,
                                    use_spmm_plan, weight_grad=False)

        # In-degree over real edges, NO self loops (GCNConv
        # add_self_loops=False — reference hscn.py:117-125).
        deg = (segment_sum(jnp.where(m_loc, 1.0, 0.0), rcv_loc, nb)
               + segment_sum(jnp.where(m_hal, 1.0, 0.0), rcv_hal, nb))
        dinv = jnp.where(deg > 0,
                         jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        dinv_halo = _halo(dinv[:, None], send_idx)[:, 0]
        w_loc = jnp.where(m_loc, dinv[snd_loc] * dinv[rcv_loc], 0.0)
        w_hal = jnp.where(m_hal, dinv_halo[snd_hal] * dinv[rcv_hal], 0.0)

        # Virtual-node init: global per-cluster mean of member features
        # (reference hetero_data.py:56-59) via local segment-sum + psum.
        ones = jnp.where(mask, 1.0, 0.0)
        cnt = jax.lax.psum(segment_sum(ones, clust, K), axis)
        xm = jnp.where(mask[:, None], x, 0.0)
        x_v = (jax.lax.psum(segment_sum(xm, clust, K), axis)
               / jnp.maximum(cnt, 1.0)[:, None])
        v_active = cnt > 0
        adj_vv = _vv_adjacency(v_active[None], 1, K, vv_pattern,
                               x.dtype)[0]
        deg_vv = jnp.sum(adj_vv, axis=-1)
        ivv = jnp.where(deg_vv > 0,
                        jax.lax.rsqrt(jnp.maximum(deg_vv, 1e-12)), 0.0)
        a_vv = adj_vv * ivv[:, None] * ivv[None, :]

        x_l = x
        if dtype is not None:
            x_l = x_l.astype(dtype)
            x_v = x_v.astype(dtype)
            w_loc, w_hal = w_loc.astype(dtype), w_hal.astype(dtype)
            a_vv = a_vv.astype(dtype)

        def _p(t):
            return t.astype(dtype) if dtype is not None else t

        for layer in params["layers"]:
            # local <- local: sharded GCN, halo overlapped with local agg
            # (Pallas SpMM on this device's block when a plan is attached).
            h = x_l @ _p(layer["ll"]["kernel"])
            halo = _halo(h, send_idx)
            agg = local_agg(h, w_loc)
            agg = agg + segment_sum(halo[snd_hal] * w_hal[:, None],
                                    rcv_hal, nb)
            x_l_new = agg + _p(layer["ll"]["bias"])

            # virtual <- local: bipartite multi-head GAT with a GLOBAL
            # per-head segment softmax over each cluster's members
            # (pmax + psum of [K, H] over ICI); H concatenated heads of
            # C = hidden // H channels (H = 1 degenerates to the
            # single-head program).
            hs = (x_l @ _p(layer["lv"]["kernel_src"])).reshape(nb, H, -1)
            hd = (x_v @ _p(layer["lv"]["kernel_dst"])).reshape(K, H, -1)
            # Attention logits + softmax statistics stay f32.
            a_s = jnp.sum(hs.astype(jnp.float32)
                          * layer["lv"]["att_src"][None], -1)     # [Nb,H]
            a_d = jnp.sum(hd.astype(jnp.float32)
                          * layer["lv"]["att_dst"][None], -1)     # [K,H]
            e = jax.nn.leaky_relu(a_s + a_d[clust], _SLOPE)
            e = jnp.where(mask[:, None], e, -jnp.inf)
            # Shift is softmax-invariant; stop_gradient BEFORE the pmax
            # (pmax has no differentiation rule, and none is needed).
            lmax = jax.lax.stop_gradient(jax.ops.segment_max(e, clust, K))
            gmax = jax.lax.pmax(lmax, axis)
            gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
            ex = jnp.where(mask[:, None], jnp.exp(e - gmax[clust]), 0.0)
            denom = jax.lax.psum(segment_sum(ex, clust, K), axis)  # [K,H]
            # Messages weighted in the stream dtype; divide in f32.
            exd = ex.astype(hs.dtype)
            num = jax.lax.psum(
                segment_sum(hs * exd[..., None], clust, K), axis)  # [K,H,C]
            lv_out = ((num.astype(jnp.float32)
                       / jnp.maximum(denom, 1e-16)[..., None])
                      .reshape(K, -1) + layer["lv"]["bias"])
            if dtype is not None:
                lv_out = lv_out.astype(dtype)

            # virtual <- virtual: replicated dense K x K DenseGCN.
            vv_out = a_vv @ (x_v @ _p(layer["vv"]["kernel"])) \
                + _p(layer["vv"]["bias"])

            if "vl" in layer:
                # virtual -> local feedback (quirk #17 extension):
                # virtual nodes are replicated, so each device projects
                # the K virtual states and gathers by its own cluster
                # ids — zero additional communication.
                vl_out = (x_v @ _p(layer["vl"]["kernel"])
                          + _p(layer["vl"]["bias"]))[clust]
                x_l_new = x_l_new + vl_out

            # HeteroConv aggr="sum" + per-type ReLU (hscn.py:97,110).
            x_l = jax.nn.relu(x_l_new)
            x_v = jax.nn.relu(lv_out + vv_out)
            x_v = jnp.where(v_active[:, None], x_v,
                            jnp.zeros((), x_v.dtype))

        x_l = jnp.where(mask[:, None], x_l,
                        jnp.zeros((), x_l.dtype)).astype(jnp.float32)
        h = jax.nn.relu(x_l @ params["head"]["h1"]["kernel"]
                        + params["head"]["h1"]["bias"])
        out = h @ params["head"]["h2"]["kernel"] \
            + params["head"]["h2"]["bias"]
        return out[None]

    forward = jax.jit(jax.shard_map(
        per_device_forward, mesh=mesh,
        in_specs=(P(),) + (P(axis),) * (10 + n_extra),
        out_specs=P(axis),
        check_vma=False,
    ))

    def per_device_value_grad(params, x_blk, mask_blk, clust_blk, send_idx,
                              snd_loc, rcv_loc, m_loc, snd_hal, rcv_hal,
                              m_hal, y_blk, node_ok_blk, gcnt, *sp):
        def local_loss(params):
            logits = per_device_forward(
                params, x_blk, mask_blk, clust_blk, send_idx, snd_loc,
                rcv_loc, m_loc, snd_hal, rcv_hal, m_hal, *sp)[0]
            y = y_blk[0]
            ok = node_ok_blk[0].astype(logits.dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
            return jnp.sum(per * ok) / gcnt

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis),
                                       grads)
        return loss, grads

    _vg = jax.jit(jax.shard_map(
        per_device_value_grad, mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 12 + (None,)
        + (P(axis),) * n_extra,
        out_specs=(P(), P()),
        check_vma=False,
    ), static_argnums=(13,))

    def _extras(plan):
        return (plan["spmm_loc"],) if use_spmm_plan else ()

    def forward_wrapper(params, x_blocks, mask_blocks, cluster_blocks,
                        plan):
        return forward(params, x_blocks, mask_blocks, cluster_blocks,
                       *(plan[k] for k in _PLAN_KEYS), *_extras(plan))

    def value_and_grad(params, x_blocks, mask_blocks, cluster_blocks,
                       plan, y_blocks, node_ok_blocks):
        gcnt = float(np.maximum(np.asarray(node_ok_blocks).sum(), 1.0))
        return _vg(params, x_blocks, mask_blocks, cluster_blocks,
                   *(plan[k] for k in _PLAN_KEYS), y_blocks,
                   node_ok_blocks, gcnt, *_extras(plan))

    return forward_wrapper, value_and_grad
