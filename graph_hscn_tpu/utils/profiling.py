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


def enable_compile_cache(cache_dir: str | None = None) -> bool:
    """Persist compiled executables to disk (default ``.jax_cache`` under
    the repo root, override via ``GRAPH_HSCN_COMPILE_CACHE``; set it to
    ``off`` to disable).  On this rig the remote compile service
    intermittently wedges for minutes; once a program has compiled
    anywhere before, reruns are served from the cache and never touch the
    service.  Safe no-op on backends/jax versions without support."""
    import os

    cache_dir = cache_dir or os.environ.get("GRAPH_HSCN_COMPILE_CACHE")
    if cache_dir == "off":
        return False
    if not cache_dir:
        from graph_hscn_tpu.constants import PROJECT_DIR
        cache_dir = str(PROJECT_DIR / ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False


def maybe_init_distributed(mode: str = "auto") -> bool:
    """Multi-host bring-up (SURVEY §2.4 comm-backend row): call
    ``jax.distributed.initialize()`` so every host in a pod slice joins one
    JAX process group and ``jax.devices()`` spans the full slice.  Must run
    before any backend initialization.

    mode "auto": initialize only when an explicit coordinator address is
    set (``JAX_COORDINATOR_ADDRESS`` / legacy ``COORDINATOR_ADDRESS``).
    Pod-style vars like ``TPU_WORKER_HOSTNAMES`` are deliberately NOT
    used as triggers — single-host rigs (including this build's relay)
    set them too.  mode "on": initialize unconditionally (jax's own
    auto-detection fills in cluster parameters on cloud TPU pods).
    mode "off": never.  Returns True iff initialization was performed.
    """
    import os

    if mode == "off":
        return False
    explicit = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"))
    if mode == "auto" and not explicit:
        return False
    kwargs = {}
    if explicit:
        kwargs["coordinator_address"] = explicit
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        # Backends already up (single-process run that merely inherited
        # pod env vars) or double-init.  "auto" degrades to single-host;
        # "on" means the user demanded multi-host — surface the error.
        if mode == "on":
            raise
        return False
    return True
