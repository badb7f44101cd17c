"""Tracing / profiling / throughput observability (SURVEY §5: the
reference's only instrumentation is a wall-clock per epoch, train.py:65).

- ``trace(dir)``: jax.profiler trace context (view in TensorBoard /
  xprof); no-op if dir is None.
- ``StepTimer``: wall-clock + throughput meter with device sync on
  boundaries (block_until_ready), reporting edges/s and steps/s.
- ``cost_analysis``: FLOP/byte estimates of a jitted function from XLA's
  own cost model.
- ``nan_guard``: enable jax_debug_nans (abort-on-NaN; the reference only
  guards eval_mae, metrics.py:33-34).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(trace_dir: str | None):
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter: edges/s, nodes/s, steps/s over a window."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.edges = 0
        self.nodes = 0

    def update(self, num_edges: int, num_nodes: int = 0):
        self.steps += 1
        self.edges += num_edges
        self.nodes += num_nodes

    def report(self) -> dict:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {
            "steps_per_sec": self.steps / dt,
            "edges_per_sec": self.edges / dt,
            "nodes_per_sec": self.nodes / dt,
            "wall_sec": dt,
        }


def cost_analysis(fn, *args):
    """XLA cost model for a jittable fn: {'flops': ..., 'bytes accessed':
    ...} (keys backend-dependent)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0] if costs else {}
    return dict(costs or {})


def nan_guard(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
