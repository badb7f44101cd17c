"""Loss functions — JAX version of the reference's criterion (loss.py:6-19).

Reference semantics:
  loss_fn == "cross_entropy":
    - multiclass (pred 2-D, true 1-D): log_softmax + NLL
    - binary/multilabel: BCE-with-logits (mean), score = sigmoid(pred)
  else ("l1"): L1 loss, and — reference quirk #10 — the returned score is
  sigmoid(pred).  ``compat_sigmoid_score`` reproduces that; default False
  returns raw predictions for regression metrics.

All losses are masked over the padded graph axis so dummy graphs contribute
nothing, and the mean is over real elements only (matching the reference's
unpadded means).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(pred, true, mask):
    """Mean BCE over real (graph, class) elements."""
    per = (jnp.maximum(pred, 0) - pred * true
           + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    return _masked_mean(per, mask)


def _masked_mean(values, mask):
    """values [G, C], mask [G] -> mean over real rows x all C columns."""
    m = mask[:, None].astype(values.dtype)
    denom = jnp.maximum(jnp.sum(m) * values.shape[-1], 1.0)
    return jnp.sum(values * m) / denom


def criterion(loss_fn: str, pred, true, mask,
              compat_sigmoid_score: bool = False):
    """Returns (loss, score) like reference criterion (loss.py:6).

    pred/true: [G, C]; mask: [G] bool (real graphs).
    Multiclass path (true 1-D int) is dispatched by caller via
    ``multiclass_nll`` since padded batches keep one-hot targets.
    """
    if loss_fn == "cross_entropy":
        per = (jnp.maximum(pred, 0) - pred * true
               + jnp.log1p(jnp.exp(-jnp.abs(pred))))
        loss = _masked_mean(per, mask)
        return loss, jax.nn.sigmoid(pred)
    elif loss_fn in ("l1", "mae"):
        per = jnp.abs(pred - true)
        loss = _masked_mean(per, mask)
        score = jax.nn.sigmoid(pred) if compat_sigmoid_score else pred
        return loss, score
    elif loss_fn == "softmax_cross_entropy":
        # Node/graph multiclass with one-hot targets.
        logp = jax.nn.log_softmax(pred, axis=-1)
        per = -jnp.sum(true * logp, axis=-1, keepdims=True)
        m = mask.astype(pred.dtype)
        loss = jnp.sum(per[:, 0] * m) / jnp.maximum(jnp.sum(m), 1.0)
        return loss, jax.nn.softmax(pred, axis=-1)
    raise ValueError(f"Unknown loss_fn {loss_fn}")
