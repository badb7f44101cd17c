"""Optimizers: optax chains matching the torch semantics the reference uses
(OPTIM_DICT, reference config/config.py:24-28; construction train.py:155-159).

torch-parity notes:
- torch AdamW decouples weight decay  -> optax.adamw (same update rule).
- torch Adam's ``weight_decay`` is L2 regularization added to the gradient
  *before* moment updates -> optax.add_decayed_weights must precede
  scale_by_adam, so we build the chain manually.
- torch Adagrad defaults: initial_accumulator_value=0, eps=1e-10; L2 decay
  added to the gradient like Adam.
"""

from __future__ import annotations

import optax


def learning_rate_schedule(lr: float, schedule: str = "constant",
                           warmup_steps: int = 0,
                           total_steps: int | None = None):
    """Peak LR + schedule name -> float or optax schedule.

    The reference trains at constant LR only (OPTIM_DICT has no schedule
    concept); "cosine"/"linear" with optional linear warmup are standard
    extensions for longer production runs.  ``total_steps`` is the decay
    horizon in optimizer steps (required for cosine/linear).
    """
    s = (schedule or "constant").lower()
    if s == "constant":
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, lr, warmup_steps)
        return lr
    if total_steps is None:
        raise ValueError(f"schedule {s!r} needs total_steps "
                         "(epochs x steps-per-epoch)")
    if s == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1), end_value=0.0)
    if s == "linear":
        decay = optax.linear_schedule(
            lr, 0.0, max(total_steps - warmup_steps, 1))
        if warmup_steps > 0:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup_steps), decay],
                [warmup_steps])
        return decay
    raise ValueError(f"Unknown LR schedule {schedule!r}")


def build_optimizer(optim_type: str, lr: float, weight_decay: float,
                    batch_accumulation: int = 1,
                    clip_grad_norm: bool = False,
                    schedule: str = "constant", warmup_steps: int = 0,
                    total_steps: int | None = None
                    ) -> optax.GradientTransformation:
    if batch_accumulation > 1 and total_steps is not None:
        # optax.MultiSteps advances the inner schedule once per k
        # accumulated mini-batches; callers pass total_steps in
        # mini-batches, so convert to optimizer updates or the decay
        # would silently cover only 1/k of its horizon.
        total_steps = -(-total_steps // batch_accumulation)
    rate = learning_rate_schedule(lr, schedule, warmup_steps, total_steps)
    t = optim_type.lower()
    if t == "adamw":
        core = optax.adamw(rate, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)
    elif t == "adam":
        core = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(rate),
        )
    elif t == "adagrad":
        core = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10),
            optax.scale_by_learning_rate(rate),
        )
    else:
        raise ValueError(f"Unknown optimizer {optim_type}")

    parts = []
    if clip_grad_norm:
        # Reference calls (deprecated) clip_grad_norm with max_norm=1.0
        # (train.py:92-93, quirk #14).
        parts.append(optax.clip_by_global_norm(1.0))
    parts.append(core)
    tx = optax.chain(*parts)
    if batch_accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=batch_accumulation)
    return tx
