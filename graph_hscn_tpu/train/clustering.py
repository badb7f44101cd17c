"""SCN clustering pre-training (stage 1 of the HSCN pipeline).

Reference: train_clustering.py:20-70 — a per-graph (batch-size-1) Python
loop over cluster_epochs, one optimizer step per *graph*.  Here the whole
padded batch trains in one jitted step (one optimizer step per batch), which
is the natural batched generalization; losses are means over the graphs in
the batch, so gradient scale matches the reference's per-graph steps up to
batching.  After training, one inference pass assigns
``argmax_k softmax(s)`` per node (reference :55-70).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.models.scn import SCN
from graph_hscn_tpu.train.optimizers import build_optimizer


def train_clustering(logger, dm: DataModule, scn: SCN, hscn_cfg, optim_cfg,
                     seed: int = 0) -> list[np.ndarray]:
    """Returns one int array of per-node cluster ids per graph (in dataset
    order), like the reference's cluster_all_lst."""
    tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                         optim_cfg.weight_decay)
    example = dm.example_batch()
    rng = jax.random.PRNGKey(seed)
    params = scn.init(rng, example, train=False)["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            _, mc, o = scn.apply({"params": p}, batch, train=True)
            return mc + o

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    @jax.jit
    def infer(params, batch):
        s, _, _ = scn.apply({"params": params}, batch, train=False)
        return jnp.argmax(s, axis=-1)

    from graph_hscn_tpu.data.batching import iter_batches
    for epoch in range(hscn_cfg.cluster_epochs):
        t0 = time.time()
        losses = []
        # The reference trains clustering on the FULL dataset — main.py:107
        # passes `dataset` (train+val+test) and train_clustering.py:36
        # iterates it all; the MinCUT objective is unsupervised, so this
        # is its transductive design, not leakage.  The device-resident
        # path (train_clustering_device) already matches; this host path
        # must too, or the two paths (and the reference) silently fit
        # clustering on different graph subsets.
        for batch in iter_batches(dm.graphs, dm.batch_size, dm.budget,
                                  shuffle=True,
                                  rng=np.random.default_rng(seed + epoch),
                                  slot_nodes=dm.slot_nodes):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(loss)
        mean_loss = float(np.mean([np.asarray(l) for l in losses]))
        logger.info(
            f"Clustering epoch {epoch}: loss={mean_loss:.4f} "
            f"({time.time() - t0:.2f}s)")
        # Reference logs cluster_loss to wandb (train_clustering.py:52-53).
        logger.wandb_log({"cluster_loss": mean_loss})

    # Inference over the full dataset in dataset order.
    logger.info("Generating cluster assignments...")
    clusters: list[np.ndarray] = []
    from graph_hscn_tpu.data.batching import iter_batches
    for batch in iter_batches(dm.graphs, dm.batch_size, dm.budget,
                              shuffle=False, slot_nodes=dm.slot_nodes):
        assign = np.asarray(infer(params, batch))
        ng = np.asarray(batch.node_graph)
        nm = np.asarray(batch.node_mask)
        for gi in range(int(batch.graph_mask.sum())):
            clusters.append(assign[nm & (ng == gi)].astype(np.int32))
    assert len(clusters) == len(dm.graphs)
    return clusters


def train_clustering_device(logger, ds, batch_size: int, scn, hscn_cfg,
                            optim_cfg, seed: int = 0):
    """Device-resident clustering pre-train: the SCN MinCUT objective over
    the whole HBM-resident dataset, one lax.scan program per epoch, and a
    final scanned inference pass producing per-graph cluster ids
    [NG, slot] that are written straight back into the DeviceDataset.

    The reference trains clustering on the FULL dataset (train+val+test,
    main.py:107 passes `dataset`), which we reproduce.
    """
    import jax.numpy as jnp

    from graph_hscn_tpu.train.device_data import (assemble,
                                                  epoch_permutation)

    tx = build_optimizer(optim_cfg.optim_type, optim_cfg.lr,
                         optim_cfg.weight_decay)
    NG = ds.num_graphs
    perm0 = epoch_permutation(NG, batch_size, seed)
    example = jax.jit(assemble)(ds, jnp.asarray(perm0[0]))
    params = scn.init(jax.random.PRNGKey(seed), example,
                      train=False)["params"]
    opt_state = tx.init(params)

    @jax.jit
    def epoch(params, opt_state, ds, perm):
        def body(carry, idx):
            params, opt_state = carry
            batch = assemble(ds, idx)

            def loss_fn(p):
                _, mc, o = scn.apply({"params": p}, batch, train=True)
                return mc + o

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return (params2, opt_state2), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), perm)
        return params, opt_state, losses

    @jax.jit
    def infer_all(params, ds, perm):
        def body(_, idx):
            batch = assemble(ds, idx)
            s, _, _ = scn.apply({"params": params}, batch, train=False)
            # [B*slot] -> [B, slot] cluster ids.
            return 0, jnp.argmax(s, -1).reshape(idx.shape[0], -1)

        _, out = jax.lax.scan(body, 0, perm)
        return out

    for ep in range(hscn_cfg.cluster_epochs):
        t0 = time.time()
        perm = jnp.asarray(epoch_permutation(NG, batch_size, seed + ep))
        params, opt_state, losses = epoch(params, opt_state, ds, perm)
        mean_loss = float(jnp.mean(losses))
        logger.info(f"Clustering epoch {ep}: loss={mean_loss:.4f} "
                    f"({time.time() - t0:.2f}s)")
        logger.wandb_log({"cluster_loss": mean_loss})

    order = epoch_permutation(NG, batch_size, 0, shuffle=False)
    preds = infer_all(params, ds, jnp.asarray(order))   # [NB, B, slot]
    flat = np.asarray(preds).reshape(-1, ds.slot)
    idx_flat = order.reshape(-1)
    cluster = np.zeros((NG, ds.slot), np.int32)
    cluster[idx_flat[idx_flat >= 0]] = flat[idx_flat >= 0]
    return ds.replace(cluster=jax.device_put(jnp.asarray(cluster)))
