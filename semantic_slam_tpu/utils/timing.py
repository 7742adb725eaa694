"""Timing/profiling utilities.

Replaces the reference's hand-rolled tick()/tock() chrono timers
(``include/Engine.hpp:148-181``) with context-manager timers that understand
JAX async dispatch (explicit sync before stopping the clock), plus a helper
to dump an XLA profiler trace for xprof/perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional


def sync(x=None):
    """Force device sync (transport-safe: scalar readback, see bench.py)."""
    import jax
    import numpy as np

    if x is None:
        import jax.numpy as jnp
        x = jnp.zeros(())
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0]).ravel()
    return x


class Timer:
    """with Timer() as t: ...; t.ms"""

    def __init__(self, device_sync: bool = False):
        self.device_sync = device_sync
        self.ms = 0.0

    def __enter__(self):
        if self.device_sync:
            sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.device_sync:
            sync()
        self.ms = (time.perf_counter() - self._t0) * 1e3
        return False


class StageTimer:
    """Accumulates per-stage wall times (Engine step1..step6 parity)."""

    def __init__(self, device_sync: bool = False):
        self.device_sync = device_sync
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        with Timer(self.device_sync) as t:
            yield
        self.times[name].append(t.ms)

    def report(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.times.items() if v}

    def __str__(self):
        return "  ".join(f"{k}:{v:.1f}ms" for k, v in self.report().items())


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace viewable in xprof/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
