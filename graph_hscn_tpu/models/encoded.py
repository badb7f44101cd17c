"""Encoder wrapper: positional-encoding module trained end-to-end with the
core model.

The reference applies SignNet once as a frozen random transform (quirk #6,
train.py:29-51).  ``frozen_random=False`` in PEConfig selects this wrapper
instead: the SignNet encoder becomes part of the model and its parameters
receive gradients from the task loss.
"""

from __future__ import annotations

import flax.linen as nn

from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.models.signnet import SignNetNodeEncoder


class EncodedModel(nn.Module):
    """core(encoder(batch)) with the encoder's output replacing node
    features."""

    encoder: SignNetNodeEncoder
    core: nn.Module

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = True):
        x_new = self.encoder(batch, train=train)
        return self.core(batch.replace(node_feat=x_new), train=train)


def wrap_with_signnet(core: nn.Module, pe_cfg, num_features: int
                      ) -> EncodedModel:
    enc = SignNetNodeEncoder(
        dim_in=num_features, dim_emb=pe_cfg.dim_emb, dim_pe=pe_cfg.dim_pe,
        phi_hidden_dim=pe_cfg.phi_hidden_dim,
        phi_out_dim=pe_cfg.phi_out_dim,
        sign_inv_layers=pe_cfg.layers, rho_layers=pe_cfg.post_layers,
        max_freqs=pe_cfg.eigen_max_freqs, model_type=pe_cfg.model)
    return EncodedModel(encoder=enc, core=core)
