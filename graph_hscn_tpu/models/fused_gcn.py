"""FusedDenseGCN: MPNN-compatible model running the whole conv stack in
the fused Pallas kernel (ops/pallas/fused_gcn_kernel.py).

Drop-in for conv_type="gcn" on slotted dense batches; selected by
``runtime.fused_stack`` (or explicitly).  Head/readout/loss stay in XLA —
the kernel covers the L-layer message-passing core, which is where the
op-count (and on this rig the per-op overhead) concentrates.  Dropout is
applied in-kernel via the TPU hardware PRNG (one traced int32 seed; no
mask arrays in HBM); on CPU (interpret mode) the bits are generated with
jax.random and fed through the identical post-bits math.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.models.layers import glorot, zeros
from graph_hscn_tpu.ops.dense import resolve_dense_adj
from graph_hscn_tpu.ops.pallas.fused_gcn_kernel import fused_gcn_stack
from graph_hscn_tpu.ops.segment import graph_readout_mean


class FusedDenseGCN(nn.Module):
    hidden_channels: int
    num_classes: int
    num_layers: int
    dropout: float = 0.0
    readout: str = "mean"
    interpret: bool = False    # pallas interpret mode (CPU tests)
    # bf16 compute: MXU operands + stored hidden activations narrow, all
    # accumulation/bias/relu/dropout math and the logits f32 (the same
    # contract as the unfused dtype= path).  None -> f32.
    dtype: Any = None

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = True):
        assert batch.slot_size is not None, (
            "FusedDenseGCN needs slotted dense batches")
        S = batch.slot_size
        G = batch.num_graphs_padded - 1
        F0 = batch.node_feat.shape[-1]
        adj = resolve_dense_adj(batch, weighted=False)

        dims = ([F0] + [self.hidden_channels] * (self.num_layers - 1)
                + [self.num_classes])
        params = []
        for i in range(self.num_layers):
            params.append({
                "kernel": self.param(f"kernel_{i}", glorot,
                                     (dims[i], dims[i + 1])),
                "bias": self.param(f"bias_{i}", zeros, (dims[i + 1],)),
            })

        x_blocks = batch.node_feat.reshape(G, S, F0)
        if self.dtype is not None:
            x_blocks = x_blocks.astype(self.dtype)
        rate = float(self.dropout) if train else 0.0
        dropout = None
        if rate > 0.0:
            rng = self.make_rng("dropout")
            if self.interpret:
                # CPU path: TPU PRNG has no interpret-mode lowering — feed
                # external bits through the identical kernel math.
                dropout = {"bits": [
                    jax.random.bits(jax.random.fold_in(rng, l),
                                    (G, S, dims[l + 1]), dtype=jnp.uint32)
                    for l in range(self.num_layers - 1)]}
            else:
                dropout = {"seed": jax.random.randint(
                    rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32)}
        h = fused_gcn_stack(x_blocks, adj, params, dropout, rate,
                            self.interpret)
        x = h.reshape(G * S, -1)
        x = jnp.where(batch.node_mask[:, None], x, 0.0)
        if self.readout == "none":
            return x
        return graph_readout_mean(x, batch.node_graph,
                                  batch.num_graphs_padded)
