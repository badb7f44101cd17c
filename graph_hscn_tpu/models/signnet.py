"""SignNet positional-encoding encoder (reference encoder/signnet.py).

Architecture (DeepSet/Masked variant, the reference default
PE_MODEL="DeepSet", defaults.py:19):

  eigvecs [N, K]  ->  [K, N, 1]  (each frequency is a scalar node signal)
  phi     = GIN stack, applied to +v and -v with SHARED weights:
            h_k = phi(v_k) + phi(-v_k)          (sign invariance)
  mask    = zero out frequencies k >= n_nodes(graph)  (NaN-padded slots)
  sum_k   -> [N, out]
  rho     = MLP -> [N, dim_pe]
  output  x_new = [Linear(x) | pe]   with total width dim_emb

TPU-native notes: the K-channel batch is an ``nn.vmap`` over the leading
axis with shared parameters (the reference loops via tensor transpose,
signnet.py:261-287); all graphs in the padded batch are processed in one
program.  The reference's MLP activation lookup bug (quirk #5 —
ACT_DICT["activation"] KeyError, signnet.py:49) is fixed: activation is
relu as intended.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.models.layers import glorot
from graph_hscn_tpu.ops.spmm import gather_scatter


def _dense(features: int, x, torch_init: bool):
    """nn.Dense with either flax-glorot (default) or the torch nn.Linear
    default init (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for
    BOTH weight and bias).  The torch family matters for the frozen-
    random SignNet (quirk #6): the reference never trains these weights,
    so the INIT DISTRIBUTION is the model — matching torch's makes the
    frozen PE features statistically comparable to the executed
    reference's (reference signnet.py MLP uses plain nn.Linear)."""
    if not torch_init:
        return nn.Dense(features, kernel_init=glorot)(x)
    bound = 1.0 / np.sqrt(x.shape[-1])

    def unif(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return nn.Dense(features, kernel_init=unif, bias_init=unif)(x)


class _GINLayer(nn.Module):
    """GINConv with an MLP update net (eps=0), vmapped over K channels.

    Mirrors the reference GIN block construction (signnet.py:86-161):
    ``mlp_layers=1`` is a single Linear; ``mlp_layers>=2`` stacks
    Linear(hidden) + relu layers before the final Linear(features)."""

    features: int
    mlp_layers: int = 1
    hidden: int | None = None      # width of the pre-final MLP Linears
    torch_init: bool = False

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, num_nodes):
        # x: [K, N, C].  Vectorized over the K channels by folding K into
        # the feature axis before one shared gather/scatter: [N, K*C].
        K, N, C = x.shape
        flat = jnp.transpose(x, (1, 0, 2)).reshape(N, K * C)
        w = jnp.where(edge_mask, 1.0, 0.0)
        agg_flat = gather_scatter(flat, senders, receivers,
                                  num_nodes=num_nodes, edge_weight=w)
        neigh = jnp.transpose(agg_flat.reshape(N, K, C), (1, 0, 2))
        h = x + neigh          # (1 + eps) x + sum, eps = 0
        for i in range(self.mlp_layers - 1):
            h = nn.relu(_dense(self.hidden or self.features, h,
                               self.torch_init))
        h = _dense(self.features, h, self.torch_init)
        return h


class SignNetNodeEncoder(nn.Module):
    """Full encoder: phi(+/-v) GIN, K-aggregation, rho MLP, concat.

    ``model_type`` selects the reference's two sign-invariant nets
    (signnet.py:290-340):
      "DeepSet" (default, PE_MODEL) -> MaskedGINDeepSigns: zero out
        frequencies k >= n_nodes(graph), SUM over K (signnet.py:216-287).
      "MLP" -> GINDeepSigns: CONCAT over all K frequencies, rho takes
        K * phi_out_dim inputs (signnet.py:164-213).
    """

    dim_in: int
    dim_emb: int
    dim_pe: int = 4
    phi_hidden_dim: int = 32
    phi_out_dim: int = 4
    sign_inv_layers: int = 1
    rho_layers: int = 1
    max_freqs: int = 10
    expand_x: bool = True
    model_type: str = "DeepSet"
    # torch nn.Linear init family throughout — used by the frozen-random
    # compat path so the untrained encoder's feature distribution matches
    # the executed reference's (see _dense).
    torch_init: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        assert batch.eigvecs is not None, (
            "Precomputed eigenvectors required for SignNetNodeEncoder")
        N = batch.num_nodes_padded
        K = self.max_freqs

        ev = batch.eigvecs[:, :K]                     # [N, K]
        nan_mask = jnp.isnan(ev)
        ev = jnp.where(nan_mask, 0.0, ev)
        x = jnp.transpose(ev, (1, 0))[:, :, None]     # [K, N, 1]

        # phi: GIN stack with shared weights for +v / -v, mirroring the
        # reference GIN construction (signnet.py:86-145): an input conv
        # at phi_hidden_dim (1-layer MLP), sign_inv_layers-2 hidden convs
        # at phi_hidden_dim, and an output conv whose 2-layer MLP runs
        # phi_hidden_dim -> phi_out_dim.  Note the reference's
        # ``n_layers=1`` (PE_LAYERS default) still builds TWO GINConvs
        # (input + output; its hidden range(n_layers-2) is empty).
        layers = (
            [_GINLayer(features=self.phi_hidden_dim, mlp_layers=1,
                       torch_init=self.torch_init)]
            + [_GINLayer(features=self.phi_hidden_dim, mlp_layers=1,
                         torch_init=self.torch_init)
               for _ in range(max(self.sign_inv_layers - 2, 0))]
            + [_GINLayer(features=self.phi_out_dim, mlp_layers=2,
                         hidden=self.phi_hidden_dim,
                         torch_init=self.torch_init)]
        )

        def phi(v):
            h = v
            for layer in layers:
                h = layer(h, batch.senders, batch.receivers,
                          batch.edge_mask, N)
            return h

        h = phi(x) + phi(-x)                          # [K, N, out]
        h = jnp.transpose(h, (1, 0, 2))               # [N, K, out]

        if self.model_type == "MLP":
            # GINDeepSigns: concat over K (signnet.py:205-212).
            h = h.reshape(h.shape[0], -1)             # [N, K*out]
        else:
            # Mask frequencies beyond each graph's node count (reference
            # MaskedGINDeepSigns.batched_n_nodes, signnet.py:243-259).
            n_per_node = batch.n_node[batch.node_graph]   # [N]
            freq_ids = jnp.arange(K)[None, :]
            mask = freq_ids < n_per_node[:, None]         # [N, K]
            h = jnp.where(mask[:, :, None], h, 0.0)
            h = jnp.sum(h, axis=1)                        # [N, out]

        # rho MLP -> dim_pe.
        for _ in range(max(self.rho_layers - 1, 0)):
            h = nn.relu(_dense(self.phi_hidden_dim, h, self.torch_init))
        pe = _dense(self.dim_pe, h, self.torch_init)

        if self.expand_x:
            base = _dense(self.dim_emb - self.dim_pe, batch.node_feat,
                          self.torch_init)
        else:
            base = batch.node_feat
        out = jnp.concatenate([base, pe], axis=-1)
        return jnp.where(batch.node_mask[:, None], out, 0.0)
