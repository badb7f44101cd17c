"""Edge-partitioned GatedGCN: edge-featured gated message passing over a
device mesh — the LRGB-standard VOC-SP architecture (models/gatedgcn.py,
absent from the reference's CONV_DICT) at giant-graph scale.

Sharding layout is the sharded-GCN one (parallel/edge_partition.py):
contiguous node blocks, receiver-owned edges, targeted all_to_all halo
exchange of the current node features once per layer.  GatedGCN's edge
STATE never moves: every edge lives on its receiver's device for the whole
run (gates, edge LayerNorm, and edge residuals are all edge-local), so the
only per-layer communication is the same node-feature halo as GCN — the
gate computation E(x_snd)/B(x_snd) for halo senders happens on the
receiving device from the exchanged raw features.

Per-layer math mirrors models/layers.GatedGCNConv exactly (parity-tested
with mapped weights in tests/test_sharded_gatedgcn.py):

    e'  = C e + D x_rcv + E x_snd
    eta = sigmoid(e') / (sum_rcv sigmoid(e') + 1e-6)
    x'  = A x + sum eta * (B x_snd)
    LayerNorm(x'), LayerNorm(e'), ReLU, residual on both streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_hscn_tpu.ops.segment import segment_sum

_PLAN_KEYS = ("send_idx", "snd_loc", "rcv_loc", "mask_loc",
              "snd_hal", "rcv_hal", "mask_hal")
_EPS = 1e-6


def hidden_of(params) -> int:
    return int(params["enc_x"]["kernel"].shape[1])


def _glorot(key, shape):
    scale = jnp.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, minval=-scale, maxval=scale)


def init_sharded_gatedgcn_params(rng, num_features: int, edge_features,
                                 hidden: int, num_classes: int,
                                 num_layers: int) -> dict:
    """Param pytree mirroring GatedGCNNet (node/edge encoders ->
    L x {A..E, LN_x, LN_e} -> node-level head)."""
    def ln():
        return {"scale": jnp.ones((hidden,)), "bias": jnp.zeros((hidden,))}

    rng, k = jax.random.split(rng)
    params = {"enc_x": {"kernel": _glorot(k, (num_features, hidden)),
                        "bias": jnp.zeros((hidden,))},
              "layers": []}
    if edge_features:
        rng, k = jax.random.split(rng)
        params["enc_e"] = {"kernel": _glorot(k, (edge_features, hidden)),
                           "bias": jnp.zeros((hidden,))}
    for _ in range(num_layers):
        rng, *ks = jax.random.split(rng, 6)
        layer = {name: {"kernel": _glorot(kk, (hidden, hidden)),
                        "bias": jnp.zeros((hidden,))}
                 for name, kk in zip("ABCDE", ks)}
        layer["ln_x"] = ln()
        layer["ln_e"] = ln()
        params["layers"].append(layer)
    rng, k = jax.random.split(rng)
    params["head"] = {"kernel": _glorot(k, (hidden, num_classes)),
                      "bias": jnp.zeros((num_classes,))}
    return params


def _layer_norm(x, p, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def make_sharded_gatedgcn(mesh: Mesh, num_layers: int, axis: str = "data",
                          use_spmm_plan: bool = False, dtype=None,
                          dropout: float = 0.0):
    """Builds (forward, value_and_grad).

    forward(params, x_blocks [D,Nb,F], e_loc [D,El,Fe]|None,
            e_hal [D,Eh,Fe]|None, ok_blocks [D,Nb], plan) -> [D, Nb, C]
    value_and_grad adds y_blocks -> (psum'd node-level CE loss, psum'd
    grads) — same contract as make_sharded_gcn.

    ``dtype`` (e.g. jnp.bfloat16): mixed precision — params stay f32
    masters, node/edge streams and the per-layer halo payload run in
    ``dtype``; LayerNorm statistics compute in f32 (upcast, normalize,
    rejoin dtype); logits return f32.  Composes with ``use_spmm_plan``
    (the segment-reduce kernel takes bf16 operands, f32 accumulation).

    ``dropout``: per-layer node-stream dropout after the residual add
    (models/gatedgcn.py:46-48 placement), per-device folded PRNG keys
    like make_sharded_gcn.
    """
    has_key = dropout > 0.0

    def _dense(h, p):
        k, b = p["kernel"], p["bias"]
        if dtype is not None:
            k, b = k.astype(dtype), b.astype(dtype)
        return h @ k + b

    def _ln(h, p):
        # Stats in f32 under mixed precision, rejoin the stream dtype.
        out = _layer_norm(h.astype(jnp.float32), p)
        return out.astype(h.dtype)

    n_extra = 1 if use_spmm_plan else 0

    def per_device_forward(params, x_blk, ok_blk, *args, key=None):
        if n_extra:
            sp, args = args[-1], args[:-1]
        has_e = len(args) == 9   # e_loc + e_hal + the 7 plan arrays
        if has_e:
            e0_loc, e0_hal = args[0][0], args[1][0]
            plan_args = args[2:]
        else:
            e0_loc = e0_hal = None
            plan_args = args
        (send_idx, snd_loc, rcv_loc, m_loc, snd_hal, rcv_hal,
         m_hal) = (a[0] for a in plan_args)
        x0 = x_blk[0]
        ok = ok_blk[0]
        nb = x0.shape[0]
        from graph_hscn_tpu.ops.pallas.spmm_kernel import VMEM_X_BUDGET
        hid = hidden_of(params)
        if (n_extra and hid >= 64
                and nb * max(hid, 128) * 4 <= VMEM_X_BUDGET):
            # Local-group scatters and gather-backwards ride the windowed
            # one-hot segment-reduce kernel on this device's plan (the
            # same 2.1x lever as the single-device GatedGCN layer; halo
            # groups are small and stay XLA).  Width gate: below ~F=64
            # the kernel's lane-padded one-hot MACs lose to the XLA
            # scatter (same crossover as _make_local_agg, BASELINE
            # round-4).  VMEM gate: the segment-reduce keeps its f32
            # [Nb, max(F,128)] out-buffer resident — oversized blocks
            # (1-device giant batches) stay XLA.
            from graph_hscn_tpu.ops.segment import (gather_planned,
                                                    segment_sum_planned)
            sp_d = jax.tree_util.tree_map(lambda a: a[0], sp)

            def seg_loc(m):
                return segment_sum_planned(m, rcv_loc, nb, plan=sp_d,
                                           indices_are_sorted=False
                                           ).astype(m.dtype)

            def take_rcv(h):
                return gather_planned(h, rcv_loc, plan=sp_d,
                                      side="receiver")

            def take_snd(h):
                return gather_planned(h, snd_loc, plan=sp_d, side="sender")
        else:
            def seg_loc(m):
                return segment_sum(m, rcv_loc, nb)

            def take_rcv(h):
                return h[rcv_loc]

            def take_snd(h):
                return h[snd_loc]

        def _halo(h):
            outbound = jnp.take(h, send_idx, axis=0)
            inbound = jax.lax.all_to_all(outbound, axis, split_axis=0,
                                         concat_axis=0, tiled=False)
            return inbound.reshape(-1, h.shape[-1])

        if dtype is not None:
            x0 = x0.astype(dtype)
            if e0_loc is not None:
                e0_loc = e0_loc.astype(dtype)
                e0_hal = e0_hal.astype(dtype)
        x = _dense(x0, params["enc_x"])
        hidden = x.shape[-1]
        if has_e:
            e_loc = _dense(e0_loc, params["enc_e"])
            e_hal = _dense(e0_hal, params["enc_e"])
        else:
            e_loc = jnp.zeros((snd_loc.shape[0], hidden), x.dtype)
            e_hal = jnp.zeros((snd_hal.shape[0], hidden), x.dtype)

        for li, layer in enumerate(params["layers"]):
            # Issue the feature exchange first; all local-sender work
            # (the bulk) runs while the all_to_all is in flight.
            halo = _halo(x)
            dx = _dense(x, layer["D"])
            ex = _dense(x, layer["E"])
            bx = _dense(x, layer["B"])
            e_hal_src = _dense(halo, layer["E"])
            b_hal_src = _dense(halo, layer["B"])

            e_new_loc = _dense(e_loc, layer["C"]) + take_rcv(dx) \
                + take_snd(ex)
            e_new_hal = _dense(e_hal, layer["C"]) + dx[rcv_hal] \
                + e_hal_src[snd_hal]
            zero = jnp.zeros((), e_new_loc.dtype)
            sig_loc = jnp.where(m_loc[:, None],
                                jax.nn.sigmoid(e_new_loc), zero)
            sig_hal = jnp.where(m_hal[:, None],
                                jax.nn.sigmoid(e_new_hal), zero)
            # Gate normalization in f32: the denominator accumulates many
            # sigmoids and divides against eps — upcast BEFORE the sum
            # (summing bf16 then upcasting has already rounded).
            denom = (seg_loc(sig_loc.astype(jnp.float32))
                     + segment_sum(sig_hal.astype(jnp.float32), rcv_hal,
                                   nb))
            agg = (seg_loc(sig_loc * take_snd(bx))
                   + segment_sum(sig_hal * b_hal_src[snd_hal], rcv_hal,
                                 nb))
            ratio = agg.astype(jnp.float32) / (denom + _EPS)
            x_new = _dense(x, layer["A"]) + ratio.astype(x.dtype)

            x_new = jax.nn.relu(_ln(x_new, layer["ln_x"]))
            e_new_loc = jax.nn.relu(_ln(e_new_loc, layer["ln_e"]))
            e_new_hal = jax.nn.relu(_ln(e_new_hal, layer["ln_e"]))
            x = x + x_new
            e_loc = e_loc + e_new_loc
            e_hal = e_hal + e_new_hal
            if key is not None:
                # Node-stream dropout after the residual add
                # (models/gatedgcn.py:46-48).
                from graph_hscn_tpu.parallel.sharded_gcn import _dropout
                x = _dropout(x, key, li, dropout)

        x = jnp.where(ok[:, None], x, jnp.zeros((), x.dtype))
        out = _dense(x, params["head"])
        return out.astype(jnp.float32)[None]

    def _specs(n_in):
        return (P(),) + (P(axis),) * n_in

    fwd_e = jax.jit(jax.shard_map(per_device_forward, mesh=mesh,
                                  in_specs=_specs(11 + n_extra),
                                  out_specs=P(axis),
                                  check_vma=False))
    fwd_noe = jax.jit(jax.shard_map(per_device_forward, mesh=mesh,
                                    in_specs=_specs(9 + n_extra),
                                    out_specs=P(axis),
                                    check_vma=False))

    def per_device_value_grad(params, x_blk, ok_blk, y_blk, gcnt, *args):
        if has_key:
            from graph_hscn_tpu.parallel.sharded_gcn import _device_key
            key, args = _device_key(args[0], axis), args[1:]
        else:
            key = None

        def local_loss(params):
            logits = per_device_forward(params, x_blk, ok_blk, *args,
                                        key=key)[0]
            y = y_blk[0]
            w = ok_blk[0].astype(logits.dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(y * logp, axis=-1)
            return jnp.sum(per * w) / gcnt

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis),
                                       grads)
        return loss, grads

    def _vg_specs(n_in):
        return ((P(),) + (P(axis),) * 3 + (None,)
                + ((P(),) if has_key else ()) + (P(axis),) * n_in)

    vg_e = jax.jit(jax.shard_map(per_device_value_grad, mesh=mesh,
                                 in_specs=_vg_specs(9 + n_extra),
                                 out_specs=(P(), P()), check_vma=False),
                   static_argnums=(4,))
    vg_noe = jax.jit(jax.shard_map(per_device_value_grad, mesh=mesh,
                                   in_specs=_vg_specs(7 + n_extra),
                                   out_specs=(P(), P()), check_vma=False),
                     static_argnums=(4,))

    def _eargs(e_loc, e_hal, plan):
        base = tuple(plan[k] for k in _PLAN_KEYS)
        if use_spmm_plan:
            base = base + (plan["spmm_loc"],)
        if e_loc is None:
            return base
        return (e_loc, e_hal) + base

    def forward(params, x_blocks, e_loc, e_hal, ok_blocks, plan):
        assert len(params["layers"]) == num_layers
        f = fwd_noe if e_loc is None else fwd_e
        return f(params, x_blocks, ok_blocks, *_eargs(e_loc, e_hal, plan))

    def value_and_grad(params, x_blocks, e_loc, e_hal, ok_blocks, plan,
                       y_blocks, key=None):
        assert len(params["layers"]) == num_layers
        gcnt = float(np.maximum(np.asarray(ok_blocks).sum(), 1.0))
        f = vg_noe if e_loc is None else vg_e
        extras = ()
        if has_key:
            if key is None:
                raise ValueError(
                    "dropout > 0 training steps need a fresh per-step "
                    "PRNG key (see make_sharded_gcn.value_and_grad)")
            extras = (key,)
        return f(params, x_blocks, ok_blocks, y_blocks, gcnt, *extras,
                 *_eargs(e_loc, e_hal, plan))

    return forward, value_and_grad


def gather_edge_groups(edge_feat, plan_np):
    """Host-side: per-device edge-feature groups aligned with the plan's
    local/halo edge layout ([D, El, Fe], [D, Eh, Fe]); None passthrough."""
    if edge_feat is None:
        return None, None
    ef = np.asarray(edge_feat)
    e_loc = ef[plan_np["eidx_loc"]] * plan_np["mask_loc"][..., None]
    e_hal = ef[plan_np["eidx_hal"]] * plan_np["mask_hal"][..., None]
    return e_loc.astype(np.float32), e_hal.astype(np.float32)
