"""Edge-partitioned GPS: ring attention over node blocks — the
context-parallel (sequence-parallel) analog for giant-graph transformers.

The single-device GPS (models/gps.py) computes per-graph global attention
as batched slot-block matmuls; that caps the attendable context at one
graph per slot and one device's memory.  This module shards the node
dimension across the mesh exactly like the sharded GCN
(parallel/edge_partition.py: contiguous node blocks, receiver-owned edges,
targeted all_to_all halo exchange for the local conv) and computes the
global attention with a RING schedule:

    each device holds Q for its own node block; K/V blocks rotate around
    the mesh axis via ``lax.ppermute`` (D-1 hops over ICI), and the
    softmax is accumulated ONLINE (flash-attention style running
    max/denominator/numerator), so no device ever materializes an
    [N, N] score matrix — per-step memory is [Nb, tile] per head.

Attention is masked per graph (queries attend only to keys with the same
graph id), which makes the result exactly equal to the single-device
per-graph slot attention — verified with mapped weights in
tests/test_sharded_gps.py.  For a single giant graph the same code is
true global attention over all N nodes, a capability the slotted layout
cannot express (SURVEY §2.4 listed CP/ring attention as "no graph analog"
— this is the analog: the node dimension IS the sequence dimension).

Layer semantics mirror models/gps.py (pre-norm, GCN local + MHA global +
GELU FFN, residuals, the three per-layer dropout sites with per-device
folded PRNG keys).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_hscn_tpu.ops.segment import segment_sum

_PLAN_KEYS = ("send_idx", "snd_loc", "rcv_loc", "mask_loc",
              "snd_hal", "rcv_hal", "mask_hal")
NEG_INF = -1e9   # additive key-mask bias (matches models/gps.py)


def _glorot(key, shape, n_in: int = 1):
    """Glorot-uniform with the first ``n_in`` axes as fan-in — matches
    flax DenseGeneral's fan computation for multi-axis kernels (wq/wk/wv
    have 1 input axis and (heads, hd) output axes; wo the reverse)."""
    fan_in = int(np.prod(shape[:n_in]))
    fan_out = int(np.prod(shape[n_in:]))
    scale = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-scale, maxval=scale)


def init_sharded_gps_params(rng, num_features: int, hidden: int,
                            num_classes: int, num_layers: int,
                            num_heads: int, local_conv: str = "gcn",
                            edge_features: int | None = None) -> dict:
    """Param pytree mirroring GPSModel's module structure
    (tests map it 1:1 onto the flax variables).

    ``local_conv="gatedgcn"``: each layer carries the five GatedGCN
    projections A..E instead of the single GCN kernel, plus a top-level
    edge encoder (models/gps.py GPSModel: edge features -> hidden; a
    constant 1-column encoder when the dataset has none)."""
    assert hidden % num_heads == 0
    hd = hidden // num_heads

    def ln():
        return {"scale": jnp.ones((hidden,)), "bias": jnp.zeros((hidden,))}

    def dense(key, n_in):
        return {"kernel": _glorot(key, (n_in, hidden)),
                "bias": jnp.zeros((hidden,))}

    rng, k = jax.random.split(rng)
    params = {"in": {"kernel": _glorot(k, (num_features, hidden)),
                     "bias": jnp.zeros((hidden,))},
              "layers": [], "ln_f": ln()}
    if local_conv == "gatedgcn":
        rng, k = jax.random.split(rng)
        params["enc_e"] = dense(k, edge_features or 1)
    for _ in range(num_layers):
        rng, k1, k2, k3, k4, k5, k6, k7 = jax.random.split(rng, 8)
        if local_conv == "gatedgcn":
            rng, *gks = jax.random.split(rng, 6)
            local_p = {name: dense(kk, hidden)
                       for name, kk in zip("ABCDE", gks)}
        else:
            local_p = {"kernel": _glorot(k1, (hidden, hidden)),
                       "bias": jnp.zeros((hidden,))}
        params["layers"].append({
            "ln1": ln(),
            "local": local_p,
            "ln2": ln(),
            "attn": {
                "wq": _glorot(k2, (hidden, num_heads, hd)),
                "bq": jnp.zeros((num_heads, hd)),
                "wk": _glorot(k3, (hidden, num_heads, hd)),
                "bk": jnp.zeros((num_heads, hd)),
                "wv": _glorot(k4, (hidden, num_heads, hd)),
                "bv": jnp.zeros((num_heads, hd)),
                "wo": _glorot(k5, (num_heads, hd, hidden), n_in=2),
                "bo": jnp.zeros((hidden,)),
            },
            "ln3": ln(),
            "ffn1": {"kernel": _glorot(k6, (hidden, 2 * hidden)),
                     "bias": jnp.zeros((2 * hidden,))},
            "ffn2": {"kernel": _glorot(k7, (2 * hidden, hidden)),
                     "bias": jnp.zeros((hidden,))},
        })
    rng, k = jax.random.split(rng)
    params["head"] = {"kernel": _glorot(k, (hidden, num_classes)),
                      "bias": jnp.zeros((num_classes,))}
    return params


def _layer_norm(x, p, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _ring_attention(g, ap, gid, ok, axis: str, num_devices: int,
                    tile: int):
    """Online-softmax ring attention over the mesh axis.

    g [Nb, H] pre-normed features; gid [Nb] graph ids; ok [Nb] node mask.
    Returns [Nb, H].  K/V/gid/ok blocks rotate via ppermute; each resident
    block is consumed in [tile]-sized chunks under lax.scan, maintaining
    the running (max, denom, numerator) in f32.  K/V blocks are padded up
    to a tile multiple (padding keys masked out via ok), so any block
    size gets full-width MXU tiles.
    """
    nb = g.shape[0]
    nh, hd = ap["wq"].shape[1], ap["wq"].shape[2]
    q = jnp.einsum("nf,fhd->nhd", g, ap["wq"]) + ap["bq"]
    k = jnp.einsum("nf,fhd->nhd", g, ap["wk"]) + ap["bk"]
    v = jnp.einsum("nf,fhd->nhd", g, ap["wv"]) + ap["bv"]
    pad = (-nb) % tile
    if pad:
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        gid_k = jnp.pad(gid, (0, pad))
        ok_k = jnp.pad(ok, (0, pad))
    else:
        gid_k, ok_k = gid, ok
    nbp = nb + pad
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    m0 = jnp.full((nb, nh), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((nb, nh), jnp.float32)
    a0 = jnp.zeros((nb, nh, hd), jnp.float32)
    perm = [(i, (i + 1) % num_devices) for i in range(num_devices)]

    # Rematerialized: without checkpoint, AD through the scan would SAVE
    # every tile's [Nb, nh, tile] probability block for the backward —
    # O(N^2) memory, exactly what the online softmax exists to avoid
    # (observed: 60 GB HBM demand at N=25k).  With it, the backward
    # recomputes scores/probs per tile from q/k_t (flash-attention
    # backward via recompute); only the O(N) carries are stored.
    @jax.checkpoint
    def tile_step(carry, blk):
        m, l, acc = carry
        k_t, v_t, g_t, o_t = blk                       # [tile, ...]
        s = jnp.einsum("qhd,khd->qhk", q, k_t).astype(jnp.float32) * scale
        bias = jnp.where((gid[:, None] == g_t[None, :]) & o_t[None, :],
                         0.0, NEG_INF)                 # [Nb, tile]
        s = s + bias[:, None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "qhk,khd->qhd", p, v_t.astype(jnp.float32))
        return (m_new, l, acc), None

    def ring_step(carry, _):
        m, l, acc, kc, vc, gc, oc = carry
        t = nbp // tile
        blocks = (kc.reshape(t, tile, nh, hd), vc.reshape(t, tile, nh, hd),
                  gc.reshape(t, tile), oc.reshape(t, tile))
        (m, l, acc), _ = jax.lax.scan(tile_step, (m, l, acc), blocks)
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        gc = jax.lax.ppermute(gc, axis, perm)
        oc = jax.lax.ppermute(oc, axis, perm)
        return (m, l, acc, kc, vc, gc, oc), None

    (m, l, acc, *_), _ = jax.lax.scan(
        ring_step, (m0, l0, a0, k, v, gid_k, ok_k), None,
        length=num_devices)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = jnp.einsum("qhd,hdf->qf", out.astype(g.dtype), ap["wo"]) \
        + ap["bo"]
    return jnp.where(ok[:, None], out, 0.0)


def make_sharded_gps(mesh: Mesh, num_layers: int, num_heads: int,
                     axis: str = "data", tile: int | None = None,
                     dtype=None, shard_axes=None, grad_axes=None,
                     dropout: float = 0.0, local_conv: str = "gcn"):
    """Builds (forward, value_and_grad) for the ring-attention GPS.

    forward(params, x_blocks [D,Nb,F], gid_blocks [D,Nb], ok_blocks [D,Nb],
            plan) -> logits [D, Nb, C]
    value_and_grad adds y_blocks/node_ok_blocks -> (psum'd node-level CE
    loss, psum'd grads) — the same contract as make_sharded_gcn.

    ``dtype`` (e.g. jnp.bfloat16): mixed precision — the residual stream
    and softmax statistics stay f32; matmul inputs/kernels, the GCN halo,
    and the rotating K/V ring blocks run in ``dtype`` (halving the
    per-layer all_to_all AND per-hop ppermute payloads).

    ``shard_axes``/``grad_axes``: hybrid 2-D meshes (parallel/hybrid.py) —
    the halo all_to_all and the K/V ring ride ``axis`` (the edge-partition
    axis, so attention spans exactly one data row's graph group), the
    leading device dimension shards over ``shard_axes``, loss/grads
    all-reduce over ``grad_axes``.  Both default to ``axis``.
    """
    D = int(dict(zip(mesh.axis_names, mesh.devices.shape))[axis])
    shard_axes = shard_axes if shard_axes is not None else axis
    grad_axes = grad_axes if grad_axes is not None else axis
    has_key = dropout > 0.0   # training programs carry a PRNG step key
    gated = local_conv == "gatedgcn"
    n_e = 2 if gated else 0   # e_loc/e_hal side inputs

    def _c(a):
        return a.astype(dtype) if dtype is not None else a

    def per_device_forward(params, x_blk, gid_blk, ok_blk, *args,
                           key=None):
        if gated:
            e0_loc, e0_hal = args[0][0], args[1][0]
            args = args[2:]
        else:
            e0_loc = e0_hal = None
        (send_idx, snd_loc, rcv_loc, m_loc, snd_hal, rcv_hal,
         m_hal) = (a[0] for a in args)
        x0 = x_blk[0]
        gid, ok = gid_blk[0], ok_blk[0]
        nb = x0.shape[0]
        t = tile or _pick_tile(nb)

        def _halo(h):
            outbound = jnp.take(h, send_idx, axis=0)
            inbound = jax.lax.all_to_all(outbound, axis, split_axis=0,
                                         concat_axis=0, tiled=False)
            return inbound.reshape(-1, h.shape[-1])

        def _dense(h, p):
            return h @ _c(p["kernel"]) + _c(p["bias"])

        if not gated:
            # GCN normalization (layer-independent): in-degree + self
            # loop, sender-side dinv exchanged once — as make_sharded_gcn.
            deg = (segment_sum(jnp.where(m_loc, 1.0, 0.0), rcv_loc, nb)
                   + segment_sum(jnp.where(m_hal, 1.0, 0.0), rcv_hal, nb)
                   + 1.0)
            dinv = jax.lax.rsqrt(deg)
            dinv_halo = _halo(dinv[:, None])[:, 0]
            w_loc = _c(jnp.where(m_loc, dinv[snd_loc] * dinv[rcv_loc],
                                 0.0))
            w_hal = _c(jnp.where(m_hal,
                                 dinv_halo[snd_hal] * dinv[rcv_hal], 0.0))
            diag = _c(dinv * dinv)
        else:
            # GatedGCN local block (models/gps.py GPSLayer gatedgcn
            # branch: GatedGCNConv residual=False, norm="none"): edge
            # state is receiver-resident for the whole run
            # (sharded_gatedgcn layout, whose per-layer gate recipe —
            # incl. the f32 denominator-upcast rationale — this
            # mirrors); _eargs always supplies both edge inputs.
            e_loc = _dense(_c(e0_loc), params["enc_e"])
            e_hal = _dense(_c(e0_hal), params["enc_e"])

        x = (_c(x0) @ _c(params["in"]["kernel"])
             + params["in"]["bias"]).astype(jnp.float32)
        for li, layer in enumerate(params["layers"]):
            # Three dropout sites per layer (models/gps.py GPSLayer:
            # local, attention, FFN) — distinct folded sub-keys.
            def drop(h, branch, li=li):
                if key is None:
                    return h
                from graph_hscn_tpu.parallel.sharded_gcn import _dropout
                return _dropout(h, key, 3 * li + branch, dropout)
            h = _c(_layer_norm(x, layer["ln1"]))
            if gated:
                # GatedGCN local: gates from the pre-normed stream; the
                # halo carries h once, D/E/B for halo senders computed
                # on the receiving device (sharded_gatedgcn recipe).
                lp = layer["local"]
                halo_hn = _halo(h)
                dh = _dense(h, lp["D"])
                eh = _dense(h, lp["E"])
                bh = _dense(h, lp["B"])
                e_hal_src = _dense(halo_hn, lp["E"])
                b_hal_src = _dense(halo_hn, lp["B"])
                e_new_loc = _dense(e_loc, lp["C"]) + dh[rcv_loc] \
                    + eh[snd_loc]
                e_new_hal = _dense(e_hal, lp["C"]) + dh[rcv_hal] \
                    + e_hal_src[snd_hal]
                zero = jnp.zeros((), e_new_loc.dtype)
                sig_loc = jnp.where(m_loc[:, None],
                                    jax.nn.sigmoid(e_new_loc), zero)
                sig_hal = jnp.where(m_hal[:, None],
                                    jax.nn.sigmoid(e_new_hal), zero)
                denom = (segment_sum(sig_loc.astype(jnp.float32),
                                     rcv_loc, nb)
                         + segment_sum(sig_hal.astype(jnp.float32),
                                       rcv_hal, nb))
                agg = (segment_sum(sig_loc * bh[snd_loc], rcv_loc, nb)
                       + segment_sum(sig_hal * b_hal_src[snd_hal],
                                     rcv_hal, nb))
                ratio = agg.astype(jnp.float32) / (denom + 1e-6)
                local = jax.nn.relu(
                    _dense(h, lp["A"]).astype(jnp.float32) + ratio)
                # residual=False, norm="none": edge state = relu'd
                # pre-activation, padded rows zeroed (layers.py:470-478).
                e_loc = jnp.where(m_loc[:, None],
                                  jax.nn.relu(e_new_loc), zero)
                e_hal = jnp.where(m_hal[:, None],
                                  jax.nn.relu(e_new_hal), zero)
                h_local = x + drop(local, 0)
            else:
                # Local: GCNConv over the real edges (halo overlapped).
                hh = h @ _c(layer["local"]["kernel"])
                halo_h = _halo(hh)
                agg = segment_sum(hh[snd_loc] * w_loc[:, None], rcv_loc,
                                  nb)
                agg = agg + segment_sum(halo_h[snd_hal] * w_hal[:, None],
                                        rcv_hal, nb)
                local = (agg + diag[:, None] * hh).astype(jnp.float32) \
                    + layer["local"]["bias"]
                h_local = x + drop(jax.nn.relu(local), 0)

            # Global: ring attention, per-graph masked (K/V rotate in
            # the compute dtype; accumulation stays f32 inside).
            g = _c(_layer_norm(x, layer["ln2"]))
            attn_p = (jax.tree_util.tree_map(_c, layer["attn"])
                      if dtype is not None else layer["attn"])
            h_global = x + drop(_ring_attention(g, attn_p, gid, ok, axis,
                                                D, t).astype(jnp.float32),
                                1)

            h2 = h_local + h_global
            f = _c(_layer_norm(h2, layer["ln3"]))
            f = jax.nn.gelu(f @ _c(layer["ffn1"]["kernel"])
                            + _c(layer["ffn1"]["bias"]))
            f = (f @ _c(layer["ffn2"]["kernel"])).astype(jnp.float32) \
                + layer["ffn2"]["bias"]
            x = h2 + drop(f, 2)

        x = _layer_norm(x, params["ln_f"])
        out = x @ params["head"]["kernel"] + params["head"]["bias"]
        out = jnp.where(ok[:, None], out, 0.0)
        return out[None]

    forward = jax.jit(jax.shard_map(
        per_device_forward, mesh=mesh,
        in_specs=(P(),) + (P(shard_axes),) * (10 + n_e),
        out_specs=P(shard_axes),
        check_vma=False,
    ))

    def per_device_value_grad(params, x_blk, gid_blk, ok_blk, y_blk,
                              gcnt, *rest):
        if has_key:
            from graph_hscn_tpu.parallel.sharded_gcn import _device_key
            key = _device_key(rest[0], shard_axes)
            rest = rest[1:]
        else:
            key = None

        def local_loss(params):
            logits = per_device_forward(
                params, x_blk, gid_blk, ok_blk, *rest, key=key)[0]
            y = y_blk[0]
            w = ok_blk[0].astype(logits.dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
            return jnp.sum(per * w) / gcnt

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, grad_axes)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, grad_axes),
                                       grads)
        return loss, grads

    _vg = jax.jit(jax.shard_map(
        per_device_value_grad, mesh=mesh,
        in_specs=(P(),) + (P(shard_axes),) * 4 + (None,)
        + ((P(),) if has_key else ())
        + (P(shard_axes),) * (7 + n_e),
        out_specs=(P(), P()),
        check_vma=False,
    ), static_argnums=(5,))

    def _eargs(plan):
        if not gated:
            return ()
        # Edge features are optional (VOC has none): substitute a
        # ones-column encoder input ONCE per plan (cached in the dict —
        # a fresh device array per step would cost a relay upload each
        # call).
        if plan.get("e_loc") is None:
            plan["e_loc"] = jnp.ones(plan["snd_loc"].shape + (1,),
                                     jnp.float32)
            plan["e_hal"] = jnp.ones(plan["snd_hal"].shape + (1,),
                                     jnp.float32)
        return (plan["e_loc"], plan["e_hal"])

    def forward_wrapper(params, x_blocks, gid_blocks, ok_blocks, plan):
        return forward(params, x_blocks, gid_blocks, ok_blocks,
                       *_eargs(plan), *(plan[k] for k in _PLAN_KEYS))

    def value_and_grad(params, x_blocks, gid_blocks, ok_blocks, plan,
                       y_blocks, key=None):
        gcnt = float(np.maximum(np.asarray(ok_blocks).sum(), 1.0))
        extras = ()
        if has_key:
            if key is None:
                raise ValueError(
                    "dropout > 0 training steps need a fresh per-step "
                    "PRNG key (see make_sharded_gcn.value_and_grad)")
            extras = (key,)
        return _vg(params, x_blocks, gid_blocks, ok_blocks, y_blocks,
                   gcnt, *extras, *_eargs(plan),
                   *(plan[k] for k in _PLAN_KEYS))

    return forward_wrapper, value_and_grad


@functools.lru_cache(maxsize=None)
def _pick_tile(nb: int, cap: int = 512) -> int:
    """Key-tile width: the block is padded up to a tile multiple inside
    _ring_attention, so simply cap at the block size."""
    return min(cap, nb)
