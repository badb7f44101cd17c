"""Training + evaluation loops.

TPU-native redesign of the reference train/train.py:54-214:

- one jit-compiled train step (forward + backward + optimizer update) per
  bucket shape; the epoch loop feeds pre-packed batches, so there is no
  per-batch host<->device chatter (the reference syncs every batch via
  ``loss.item()``, train.py:85);
- predictions/labels accumulate on device and transfer once per epoch for
  metric computation on host;
- eval cadence, early stopping (patience counted in eval periods, quirk
  #13 preserved intentionally: it matches the reference's semantics),
  min_delta on val loss — all identical to reference train.py:164-214;
- optional data-parallel sharding over a mesh (parallel/).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_hscn_tpu.data.structures import GraphBatch
from graph_hscn_tpu.train.loss import criterion
from graph_hscn_tpu.train.metrics import METRICS
from graph_hscn_tpu.train.optimizers import build_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


def device_prefetch(batches: Iterable[GraphBatch], depth: int = 2
                    ) -> Iterable[GraphBatch]:
    """One-ahead async host->device transfer: jax.device_put dispatches
    asynchronously, so the next batch's transfer overlaps the current
    step's compute.  Essential here — host->device bandwidth dominates the
    step time otherwise (the reference pays a synchronous CPU->GPU copy per
    batch, train.py:75)."""
    import collections
    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(depth):
            queue.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while queue:
        try:
            queue.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield queue.popleft()


def is_eval_epoch(epoch: int, max_epochs: int, eval_period: int) -> bool:
    """Same cadence as reference train/utils.py:1-6."""
    return ((epoch + 1) % eval_period == 0 or epoch == 0
            or (epoch + 1) == max_epochs)


def make_train_step(model, tx, loss_fn: str, node_level: bool = False,
                    compat_sigmoid_score: bool = False,
                    extra_loss_fn: Callable | None = None,
                    donate: bool = False):
    """Build the jitted train step.  ``extra_loss_fn(params, batch) ->
    scalar`` lets callers fold in auxiliary losses (e.g. MinCUT).

    ``donate=True`` donates the incoming TrainState so XLA updates
    params/optimizer buffers in place (no per-step copy of the full
    state in HBM) — use it when the caller discards the old state each
    step, as ``fit`` does.  Keep the default for oracle tests that step
    twice from shared param buffers (donation would invalidate them on
    TPU; CPU ignores it)."""

    def loss_and_score(params, batch: GraphBatch, rng, train: bool):
        variables = {"params": params}
        kwargs = {"train": train}
        if train:
            kwargs["rngs"] = {"dropout": rng}
        pred = model.apply(variables, batch, **kwargs)
        if node_level:
            true = batch.node_y
            mask = batch.node_mask
        else:
            true = batch.y
            mask = batch.graph_mask
        loss, score = criterion(loss_fn, pred, true, mask,
                                compat_sigmoid_score=compat_sigmoid_score)
        if extra_loss_fn is not None:
            loss = loss + extra_loss_fn(params, batch)
        return loss, (score, true, mask)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: GraphBatch):
        rng, step_rng = jax.random.split(state.rng)
        (loss, (score, true, mask)), grads = jax.value_and_grad(
            loss_and_score, has_aux=True)(state.params, batch, step_rng, True)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        return new_state, loss, score, true, mask

    @jax.jit
    def eval_step(state: TrainState, batch: GraphBatch):
        loss, (score, true, mask) = loss_and_score(
            state.params, batch, state.rng, False)
        return loss, score, true, mask

    return train_step, eval_step


def init_state(model, tx, example_batch: GraphBatch, seed: int = 0
               ) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init({"params": init_rng, "dropout": init_rng},
                           example_batch, train=False)
    params = variables["params"]
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32), rng=state_rng)


def _epoch_metrics(scores, trues, masks, losses, metric_fn):
    y_pred = np.concatenate([np.asarray(s) for s in scores])
    y_true = np.concatenate([np.asarray(t) for t in trues])
    m = np.concatenate([np.asarray(k) for k in masks])
    perf = metric_fn(y_true[m], y_pred[m])
    return float(np.mean([np.asarray(l) for l in losses])), perf


@dataclasses.dataclass
class FitResult:
    state: TrainState
    best_val_loss: float
    history: list
    stopped_early: bool
    epochs_run: int


def _maybe_resume(state, checkpointer, logger):
    """Auto-resume from the latest resumable snapshot if one exists
    (params + opt state + step + rng; SURVEY §5 plan: resumable
    checkpoints — the reference never saves anything).

    Returns (state, start_epoch, best_val_loss).  The historical best
    val-loss is recovered from the best snapshot's sidecar so a resumed
    run cannot clobber a better 'best' checkpoint with a worse one."""
    if checkpointer is None or not checkpointer.has("latest"):
        return state, 0, float("inf")
    state, meta = checkpointer.restore("latest", state)
    start_epoch = int(meta.get("epoch", -1)) + 1
    best_loss = float("inf")
    if checkpointer.has("best"):
        best_meta = checkpointer.meta("best")
        best_loss = float(best_meta.get("val_loss", float("inf")))
    logger.info(f"Resumed from latest checkpoint (epoch {start_epoch}, "
                f"best val loss {best_loss:.4f}).")
    return state, start_epoch, best_loss


def run_fit_loop(training_cfg, logger, checkpointer, train_epoch, evaluate,
                 get_state, start_epoch: int = 0,
                 best_loss: float = float("inf")) -> "FitResult":
    """The ONE epoch-loop driver shared by every fit path (fit,
    fit_on_device_dataset, parallel fit_dp, fit_edge_partitioned): eval
    cadence (is_eval_epoch — reference train/utils.py:1-6), early stopping
    on val-loss plateau (reference train.py:198-214), best/latest
    checkpoints, and the history record.

    train_epoch(epoch) -> (train_loss, train_perf, num_edges | None)
    evaluate(split)    -> (loss, perf) for split in ("val", "test")
    get_state()        -> checkpointable TrainState.
    """
    try:
        return _fit_loop_body(training_cfg, logger, checkpointer,
                              train_epoch, evaluate, get_state,
                              start_epoch, best_loss)
    except BaseException:
        # Fence in-flight async snapshot writes even when an epoch raises:
        # a crash mid-run must not leave an orbax tree whose meta sidecar
        # was never written (has() requires the sidecar, so such a snapshot
        # would be invisible to resume — worse, without this fence the
        # write could still be mid-flight at process exit).  The original
        # exception propagates; a concurrent write error is secondary.
        if checkpointer is not None and hasattr(checkpointer, "wait"):
            try:
                checkpointer.wait()
            except Exception:
                pass
        raise


def _fit_loop_body(training_cfg, logger, checkpointer, train_epoch,
                   evaluate, get_state, start_epoch: int,
                   best_loss: float) -> "FitResult":
    num_improvement = 0
    history = []
    stopped = False
    epochs_run = start_epoch
    for epoch in range(start_epoch, training_cfg.epochs):
        t0 = time.time()
        train_loss, train_perf, num_edges = train_epoch(epoch)
        logger.log_train(epoch, train_loss, train_perf, t0,
                         num_edges=num_edges)
        history.append({"epoch": epoch, "train_loss": train_loss,
                        "train_perf": train_perf})
        epochs_run = epoch + 1

        if is_eval_epoch(epoch, training_cfg.epochs,
                         training_cfg.eval_period):
            for split, label in (("val", "Validation"), ("test", "Test")):
                ev_loss, ev_perf = evaluate(split)
                logger.log_eval(ev_loss, ev_perf, label)
                history[-1][f"{label.lower()}_loss"] = ev_loss
                history[-1][f"{label.lower()}_perf"] = ev_perf
                if split == "val":
                    if ev_loss < best_loss - training_cfg.min_delta:
                        best_loss = ev_loss
                        num_improvement = 0
                        if checkpointer is not None:
                            checkpointer.save_best(get_state(), epoch,
                                                   ev_loss)
                    else:
                        num_improvement += 1
                    if (num_improvement >= training_cfg.patience
                            and epoch != training_cfg.epochs - 1):
                        logger.info(
                            f"No improvement by {training_cfg.min_delta} "
                            f"for more than {training_cfg.patience} eval "
                            "periods, stopping early.")
                        stopped = True
            if stopped:
                break
            if (checkpointer is not None and training_cfg.checkpoint_every
                    and (epoch // training_cfg.eval_period)
                    % training_cfg.checkpoint_every == 0):
                checkpointer.save_latest(get_state(), epoch)

    if checkpointer is not None and hasattr(checkpointer, "wait"):
        checkpointer.wait()   # land any in-flight async snapshot write
    return FitResult(state=get_state(), best_val_loss=best_loss,
                     history=history, stopped_early=stopped,
                     epochs_run=epochs_run)


def fit_device(model, graphs_train, graphs_val, graphs_test, batch_size,
               optim_cfg, training_cfg, logger,
               node_level: bool = False,
               compat_sigmoid_score: bool = False,
               checkpointer=None, slot: int | None = None,
               profile_dir: str | None = None) -> "FitResult":
    """Device-resident training: the whole dataset lives in HBM, batches
    are assembled on device from index vectors, and each epoch is ONE
    jitted lax.scan program (train/device_data.py) — per-epoch host I/O is
    an [NB, B] int32 permutation plus the metric readback.  Same eval
    cadence + early-stopping semantics as :func:`fit`."""
    from graph_hscn_tpu.train.device_data import (DeviceDataset,
                                                  epoch_permutation,
                                                  make_epoch_fn)

    splits = {"train": list(graphs_train), "val": list(graphs_val),
              "test": list(graphs_test)}
    all_graphs = splits["train"] + splits["val"] + splits["test"]
    ds = DeviceDataset.build(all_graphs, slot=slot)
    n_tr, n_va = len(splits["train"]), len(splits["val"])
    split_ids = {
        "train": np.arange(n_tr),
        "val": np.arange(n_tr, n_tr + n_va),
        "test": np.arange(n_tr + n_va, len(all_graphs)),
    }
    edges_per_split = {k: sum(g.num_edges for g in v)
                       for k, v in splits.items()}
    return fit_on_device_dataset(
        model, ds, split_ids, batch_size, optim_cfg, training_cfg, logger,
        node_level=node_level, compat_sigmoid_score=compat_sigmoid_score,
        checkpointer=checkpointer, profile_dir=profile_dir,
        train_edges=edges_per_split["train"])


def fit_on_device_dataset(model, ds, split_ids: dict, batch_size,
                          optim_cfg, training_cfg, logger,
                          node_level: bool = False,
                          compat_sigmoid_score: bool = False,
                          checkpointer=None, profile_dir: str | None = None,
                          train_edges: int | None = None) -> "FitResult":
    """fit_device on a prebuilt DeviceDataset (shared across pipeline
    stages, e.g. HSCN clustering -> hetero training)."""
    from graph_hscn_tpu.train.device_data import (epoch_permutation,
                                                  make_epoch_fn)

    counts = {k: len(v) for k, v in split_ids.items()}
    steps_per_epoch = -(-counts["train"] // batch_size)
    tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                         optim_cfg.weight_decay,
                         optim_cfg.batch_accumulation,
                         optim_cfg.clip_grad_norm,
                         schedule=getattr(optim_cfg, "schedule", "constant"),
                         warmup_steps=getattr(optim_cfg, "warmup_steps", 0),
                         total_steps=training_cfg.epochs * steps_per_epoch)
    metric_fn = METRICS[training_cfg.metric]

    def split_perm(name, seed, shuffle):
        p = epoch_permutation(counts[name], batch_size, seed, shuffle)
        ids = np.asarray(split_ids[name])
        return np.where(p >= 0, ids[np.clip(p, 0, None)], -1).astype(
            np.int32)

    va_perm = split_perm("val", 0, False)
    te_perm = split_perm("test", 0, False)

    example = None
    train_epoch_fn, eval_epoch_fn = make_epoch_fn(
        model, tx, training_cfg.loss_fn, node_level=node_level,
        compat_sigmoid_score=compat_sigmoid_score)

    # init params from one assembled batch
    from graph_hscn_tpu.train.device_data import assemble
    example = jax.jit(assemble)(ds, jnp.asarray(va_perm[0]))
    state = init_state(model, tx, example, seed=training_cfg.seed)
    state, start_epoch, best_loss = _maybe_resume(state, checkpointer,
                                                  logger)

    def _collect(outs):
        loss, score, true, mask = outs
        sc = np.asarray(score).reshape(-1, score.shape[-1])
        tr = np.asarray(true).reshape(-1, true.shape[-1])
        mk = np.asarray(mask).reshape(-1)
        perf = metric_fn(tr[mk], sc[mk])
        return float(np.mean(np.asarray(loss))), perf

    eval_perms = {"val": va_perm, "test": te_perm}

    def train_epoch(epoch):
        nonlocal state
        perm = split_perm("train", training_cfg.seed + epoch, True)
        state, outs = train_epoch_fn(state, ds, jnp.asarray(perm))
        loss, perf = _collect(outs)
        return loss, perf, train_edges

    def evaluate(split):
        outs = eval_epoch_fn(state, ds, jnp.asarray(eval_perms[split]))
        return _collect(outs)

    from graph_hscn_tpu.utils.profiling import trace
    with trace(profile_dir):
        return run_fit_loop(training_cfg, logger, checkpointer,
                            train_epoch, evaluate, lambda: state,
                            start_epoch=start_epoch, best_loss=best_loss)


def fit(model, train_batches_fn: Callable[[int], Iterable[GraphBatch]],
        val_batches: list[GraphBatch], test_batches: list[GraphBatch],
        optim_cfg, training_cfg, logger, example_batch: GraphBatch | None = None,
        node_level: bool = False, compat_sigmoid_score: bool = False,
        shard_batch: Callable[[GraphBatch], GraphBatch] | None = None,
        checkpointer=None, prefetch: bool = False) -> FitResult:
    """Full training run with eval cadence + early stopping
    (mirrors reference train.py:147-214).

    ``train_batches_fn(epoch)`` must yield the epoch's training batches;
    threading the epoch through lets the packer reshuffle per epoch (the
    reference's DataLoader(shuffle=True) draws fresh batch compositions
    every epoch, loader.py:48-60)."""
    schedule = getattr(optim_cfg, "schedule", "constant")
    total_steps = None
    if schedule.lower() != "constant":
        # One counting pass over the packer (host-side, no device work).
        n_batches = sum(1 for _ in train_batches_fn(0))
        total_steps = training_cfg.epochs * max(n_batches, 1)
    tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                         optim_cfg.weight_decay,
                         optim_cfg.batch_accumulation,
                         optim_cfg.clip_grad_norm,
                         schedule=schedule,
                         warmup_steps=getattr(optim_cfg, "warmup_steps", 0),
                         total_steps=total_steps)
    metric_fn = METRICS[training_cfg.metric]
    if example_batch is None:
        example_batch = next(iter(train_batches_fn(0)))
    if shard_batch is not None:
        example_batch = shard_batch(example_batch)
    state = init_state(model, tx, example_batch, seed=training_cfg.seed)
    state, start_epoch, best_loss = _maybe_resume(state, checkpointer,
                                                  logger)
    # fit discards the old state every step -> donate it: params/opt
    # buffers are updated in place instead of copied per step.
    train_step, eval_step = make_train_step(
        model, tx, training_cfg.loss_fn, node_level=node_level,
        compat_sigmoid_score=compat_sigmoid_score, donate=True)

    def _feed(batches):
        if shard_batch is not None:
            return (shard_batch(b) for b in batches)
        # Explicit one-ahead device_put is the right pattern on directly
        # attached TPUs; on this session's RPC relay it measured slower
        # than jit-arg transfer, so it is opt-in.
        return device_prefetch(batches) if prefetch else batches

    def _run(batches, step):
        losses, scores, trues, masks = [], [], [], []
        new_state = state
        for batch in _feed(batches):
            out = step(new_state, batch)
            if len(out) == 5:          # train step threads the state
                new_state, loss, score, true, mask = out
            else:
                loss, score, true, mask = out
            losses.append(loss)  # device array; sync deferred to epoch end
            scores.append(score)
            trues.append(true)
            masks.append(mask)
        return new_state, _epoch_metrics(scores, trues, masks, losses,
                                         metric_fn)

    eval_sets = {"val": val_batches, "test": test_batches}

    def train_epoch(epoch):
        nonlocal state
        state, (loss, perf) = _run(train_batches_fn(epoch), train_step)
        return loss, perf, None

    def evaluate(split):
        _, (loss, perf) = _run(eval_sets[split], eval_step)
        return loss, perf

    return run_fit_loop(training_cfg, logger, checkpointer, train_epoch,
                        evaluate, lambda: state, start_epoch=start_epoch,
                        best_loss=best_loss)


def evaluate_checkpoint(model, batches_by_split: dict, optim_cfg,
                        training_cfg, checkpointer, which: str = "best",
                        example_batch: GraphBatch | None = None,
                        node_level: bool = False,
                        compat_sigmoid_score: bool = False,
                        predictions_sink: dict | None = None):
    """Restore a snapshot and score it on the given splits (inference /
    eval-only mode — no training).  Returns ({split: {"loss", metric}},
    checkpoint_meta).  With ``predictions_sink`` (a dict), also collects
    per-split prediction scores/targets over the real rows (masked) —
    the serving/export surface used by ``main.py --eval --predict``."""
    # Inference-only restore: schedule VALUES are irrelevant, but the
    # opt-state STRUCTURE must match the training run's (a schedule adds a
    # step counter), so build with the same schedule and a dummy horizon.
    tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                         optim_cfg.weight_decay,
                         optim_cfg.batch_accumulation,
                         optim_cfg.clip_grad_norm,
                         schedule=getattr(optim_cfg, "schedule", "constant"),
                         warmup_steps=getattr(optim_cfg, "warmup_steps", 0),
                         total_steps=1)
    if example_batch is None:
        example_batch = next(iter(next(iter(batches_by_split.values()))))
    state = init_state(model, tx, example_batch, seed=training_cfg.seed)
    if not checkpointer.has(which):
        raise FileNotFoundError(
            f"no '{which}' snapshot in {checkpointer.dir}")
    state, meta = checkpointer.restore(which, state)
    _, eval_step = make_train_step(
        model, tx, training_cfg.loss_fn, node_level=node_level,
        compat_sigmoid_score=compat_sigmoid_score)
    metric_fn = METRICS[training_cfg.metric]
    results = {}
    for split, batches in batches_by_split.items():
        losses, scores, trues, masks = [], [], [], []
        for batch in batches:
            loss, score, true, mask = eval_step(state, batch)
            losses.append(loss)
            scores.append(score)
            trues.append(true)
            masks.append(mask)
        loss, perf = _epoch_metrics(scores, trues, masks, losses,
                                    metric_fn)
        results[split] = {"loss": loss, training_cfg.metric: perf}
        if predictions_sink is not None:
            import numpy as _np
            s = _np.concatenate([_np.asarray(x) for x in scores])
            t = _np.concatenate([_np.asarray(x) for x in trues])
            m = _np.concatenate([_np.asarray(x) for x in masks])
            predictions_sink[split] = {"scores": s[m], "targets": t[m]}
    return results, meta
