"""Determinism guarantees (the JAX analog of SURVEY §5 'race detection'):
sorted segment reductions and full train steps must be bitwise reproducible
run-to-run."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_hscn_tpu.config.config import (DataConfig, MPNNConfig,
                                          OptimConfig, TrainingConfig)
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.models.mpnn import build_mpnn
from graph_hscn_tpu.ops.segment import segment_sum
from graph_hscn_tpu.train.loop import init_state, make_train_step
from graph_hscn_tpu.train.optimizers import build_optimizer


def test_segment_sum_deterministic():
    rng = np.random.default_rng(0)
    E, n, F = 4096, 512, 64
    seg = np.sort(rng.integers(0, n, E)).astype(np.int32)
    data = jnp.asarray(rng.normal(size=(E, F)).astype(np.float32))
    outs = [np.asarray(segment_sum(data, jnp.asarray(seg), n,
                                   indices_are_sorted=True))
            for _ in range(3)]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_train_step_bitwise_reproducible():
    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=8, num_graphs=16))
    model = build_mpnn(MPNNConfig(conv_type="gcn", activation="relu",
                                  hidden_channels=16, num_layers=2,
                                  dropout=0.2), dm.num_features,
                       dm.num_classes)
    tx = build_optimizer("adamW", 0.01, 5e-4)
    batch = dm.example_batch()

    def run():
        state = init_state(model, tx, batch, seed=7)
        step, _ = make_train_step(model, tx, "cross_entropy")
        for _ in range(3):
            state, loss, *_ = step(state, batch)
        return [np.asarray(x) for x in
                jax.tree_util.tree_leaves(state.params)]

    a, b = run(), run()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
