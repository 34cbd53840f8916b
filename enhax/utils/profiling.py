"""Tracing / profiling helpers (aux subsystem, SURVEY.md §5.1).

Replaces the reference's thop/fvcore FLOPs counting (core/thop.py:20,
nn/metric/efficiency.py) and Timer-based wall-clock with the TPU-native
trio: XLA cost analysis of the compiled HLO, hard-sync timing (the axon
relay does not serialize on block_until_ready — bench.py notes), and
jax.profiler traces for xprof.
"""

from __future__ import annotations

import contextlib
import time


def hard_sync_time(fn, *args, warmup: int = 2, runs: int = 10) -> float:
    """Seconds/call with a device->host fetch per run (reliable on axon)."""
    for _ in range(warmup):
        float(fn(*args).sum())
    t0 = time.perf_counter()
    for _ in range(runs):
        float(fn(*args).sum())
    return (time.perf_counter() - t0) / runs


def flops_of(fn, *args) -> float:
    """FLOPs from XLA cost analysis of the jitted fn."""
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def memory_analysis(fn, *args) -> dict:
    """Peak/argument/output bytes from the compiled executable."""
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    m = compiled.memory_analysis()
    if m is None:
        return {}
    return {
        "temp_bytes": getattr(m, "temp_size_in_bytes", None),
        "argument_bytes": getattr(m, "argument_size_in_bytes", None),
        "output_bytes": getattr(m, "output_size_in_bytes", None),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/enhax_trace"):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def nan_debugging(enable: bool = True):
    """Device-side NaN tracer (replaces torch detect_anomaly; SURVEY §5.2)."""
    import jax
    jax.config.update("jax_debug_nans", enable)
