"""Data-parallel correctness on the 8-device virtual CPU mesh: the DP update
over 8 shards must equal the single-device update on the concatenated batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.config.config import MPNNConfig, OptimConfig
from graph_hscn_tpu.data.batching import PadBudget, pack_batch
from graph_hscn_tpu.data.synthetic import make_peptides_func
from graph_hscn_tpu.models.mpnn import build_mpnn
from graph_hscn_tpu.parallel.data_parallel import (make_dp_train_step,
                                                   pack_for_devices,
                                                   shard_stacked_batch)
from graph_hscn_tpu.parallel.mesh import make_mesh
from graph_hscn_tpu.train.loop import TrainState, init_state, make_train_step
from graph_hscn_tpu.train.optimizers import build_optimizer


def test_dp_matches_single_device():
    num_devices = 8
    graphs = make_peptides_func(num_graphs=24, seed=7, mean_nodes=30)
    per_dev_budget = PadBudget.for_dataset(graphs, batch_size=4)
    mesh = make_mesh(("data",), (num_devices,))

    model_cfg = MPNNConfig(conv_type="gcn", activation="relu",
                           hidden_channels=16, num_layers=3, dropout=0.0)
    model = build_mpnn(model_cfg, 9, 10)
    # SGD for the equivalence check: Adam's first step is ~lr*sign(grad),
    # which amplifies fp reduction-order noise on near-zero grads into
    # O(lr) param differences; SGD is linear in the gradient.
    import optax
    tx = optax.sgd(0.1)

    stacked = pack_for_devices(graphs, num_devices, per_dev_budget)
    # Single-device reference: concatenate the same shards into one batch.
    # Equivalent global computation: global mean loss over all real graphs.
    single_budget = PadBudget(
        num_nodes=per_dev_budget.num_nodes * num_devices,
        num_edges=per_dev_budget.num_edges * num_devices,
        num_graphs=per_dev_budget.num_graphs * num_devices)
    single = pack_batch(graphs, single_budget)

    example = jax.tree_util.tree_map(lambda x: x[0], stacked)
    state0 = init_state(model, tx, example, seed=0)

    # --- single-device step
    train_step, _ = make_train_step(model, tx, "cross_entropy")
    state_single = TrainState(params=state0.params,
                              opt_state=state0.opt_state,
                              step=state0.step, rng=state0.rng)
    state_single, loss_s, *_ = train_step(state_single, single)

    # --- DP step
    dp_step = make_dp_train_step(model, tx, "cross_entropy", mesh)
    sharded = shard_stacked_batch(stacked, mesh)
    state_dp = TrainState(params=state0.params, opt_state=state0.opt_state,
                          step=state0.step, rng=state0.rng)
    state_dp, loss_dp, score, true, mask = dp_step(state_dp, sharded)

    np.testing.assert_allclose(float(loss_s), float(loss_dp), rtol=1e-5)
    flat_s = jax.tree_util.tree_leaves(state_single.params)
    flat_d = jax.tree_util.tree_leaves(state_dp.params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)
    # All graphs accounted for exactly once.
    assert int(np.asarray(mask).sum()) == len(graphs)


def test_pack_for_devices_balance():
    graphs = make_peptides_func(num_graphs=33, seed=8, mean_nodes=30)
    budget = PadBudget.for_dataset(graphs, batch_size=6)
    stacked = pack_for_devices(graphs, 8, budget)
    assert stacked.node_feat.shape[0] == 8
    counts = stacked.graph_mask.sum(axis=1)
    assert counts.sum() == 33
    # Load-balanced: no device more than 2 graphs above the min.
    assert counts.max() - counts.min() <= 2


def test_dp_gatedgcn_edge_features():
    """DP shard_map training with edge features (GatedGCN on
    Peptides-struct semantics: L1 loss, edge_attr arrays survive the
    device packing)."""
    import jax
    import numpy as np

    from graph_hscn_tpu.data.batching import PadBudget
    from graph_hscn_tpu.data.synthetic import make_peptides_struct
    from graph_hscn_tpu.models.gatedgcn import GatedGCNNet
    from graph_hscn_tpu.parallel.data_parallel import (make_dp_train_step,
                                                       pack_for_devices,
                                                       shard_stacked_batch)
    from graph_hscn_tpu.parallel.mesh import make_mesh
    from graph_hscn_tpu.train.loop import init_state
    from graph_hscn_tpu.train.optimizers import build_optimizer

    D = 8
    graphs = make_peptides_struct(num_graphs=16, seed=5)
    budget = PadBudget.for_dataset(graphs, batch_size=2)
    mesh = make_mesh(("data",), (D,))
    stacked = pack_for_devices(graphs, D, budget)
    assert stacked.edge_feat is not None

    model = GatedGCNNet(hidden_channels=16, num_classes=11, num_layers=2)
    tx = build_optimizer("adamW", 1e-3, 5e-4)
    example = jax.tree_util.tree_map(lambda x: x[0], stacked)
    state = init_state(model, tx, example, seed=0)
    step = make_dp_train_step(model, tx, "l1", mesh)
    sharded = shard_stacked_batch(stacked, mesh)
    state, loss, score, true, mask = step(state, sharded)
    assert np.isfinite(float(loss))


def test_dp_final_partial_batch_with_empty_devices():
    """VERDICT round-1 item 10: a final partial batch where most devices
    receive the _empty_batch placeholder, under slot_nodes + spmm plans —
    the most likely silent-shape-bug corner.  The DP update must still
    equal the single-device update on the real graphs."""
    num_devices = 8
    graphs = make_peptides_func(num_graphs=3, seed=9, mean_nodes=30)
    budget = PadBudget.for_dataset(graphs, batch_size=1)
    slot = ((max(g.num_nodes for g in graphs) + 7) // 8) * 8
    mesh = make_mesh(("data",), (num_devices,))

    model = build_mpnn(MPNNConfig(conv_type="gcn", activation="relu",
                                  hidden_channels=8, num_layers=2,
                                  dropout=0.0), 9, 10)
    import optax
    tx = optax.sgd(0.1)

    stacked = pack_for_devices(graphs, num_devices, budget,
                               slot_nodes=slot, with_spmm_plan=True)
    # 5 of 8 devices hold only the masked placeholder graph.
    per_dev = np.asarray(stacked.graph_mask).sum(axis=1)
    assert (per_dev == 0).sum() == num_devices - 3
    # Placeholder devices still carry shape-consistent plan arrays.
    assert stacked.spmm is not None
    assert stacked.spmm.snd_rel.shape[0] == num_devices

    single_budget = PadBudget(
        num_nodes=budget.num_nodes * num_devices,
        num_edges=budget.num_edges * num_devices,
        num_graphs=budget.num_graphs * num_devices)
    single = pack_batch(graphs, single_budget, slot_nodes=slot)

    example = jax.tree_util.tree_map(lambda x: x[0], stacked)
    state0 = init_state(model, tx, example, seed=0)
    train_step, _ = make_train_step(model, tx, "cross_entropy")
    state_single, loss_s, *_ = train_step(
        TrainState(params=state0.params, opt_state=state0.opt_state,
                   step=state0.step, rng=state0.rng), single)

    dp_step = make_dp_train_step(model, tx, "cross_entropy", mesh)
    state_dp, loss_dp, score, true, mask = dp_step(
        TrainState(params=state0.params, opt_state=state0.opt_state,
                   step=state0.step, rng=state0.rng),
        shard_stacked_batch(stacked, mesh))

    assert np.isfinite(float(loss_dp))
    np.testing.assert_allclose(float(loss_s), float(loss_dp), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_single.params),
                    jax.tree_util.tree_leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)
    # Exactly the 3 real graphs scored; placeholders fully masked.
    assert int(np.asarray(mask).sum()) == 3
