"""Benchmark-harness observability (SURVEY.md §5.1, §5.5).

The reference library is silent (no timers/logging anywhere in src); we
keep the library core silent too and confine observability to this opt-in
helper used by bench.py and profiling scripts: wall-clock timers with
device synchronisation, nnz/s accounting, and an optional jax.profiler
trace context.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class Timer:
    """Accumulating wall-clock timer with device sync."""

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str, sync_value=None):
        import jax

        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def best(self, name: str) -> float:
        """Min over repetitions — the least-noise estimate of true device
        time (the same estimator the bench uses for the CPU baseline, so
        comparisons are apples-to-apples; medians drift up to +35% under
        transient tunnel/host load)."""
        return float(min(self.records[name]))

    def median(self, name: str) -> float:
        import numpy as np

        return float(np.median(self.records[name]))

    def summary(self) -> Dict[str, float]:
        return {k: self.median(k) for k in self.records}


def nnz_per_second(nnz: int, seconds: float, nrhs: int = 1) -> float:
    """The BASELINE.json throughput metric: factor nonzeros per second,
    scaled by the RHS panel width."""
    return nnz * nrhs / seconds


@contextlib.contextmanager
def device_trace(dirname: Optional[str]):
    """jax.profiler trace context (no-op when dirname is None)."""
    import jax

    if dirname is None:
        yield
        return
    with jax.profiler.trace(dirname):
        yield
