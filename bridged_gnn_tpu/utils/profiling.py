"""Tracing / profiling hooks (SURVEY §5.1: absent in the reference).

Thin wrappers over the JAX profiler plus the framework's north-star
throughput counter (edges/sec/chip) and a per-step timing aggregator.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing + derived throughput counters."""

    def __init__(self, num_edges: int = 0, warmup: int = 2):
        self.num_edges = num_edges
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def steady(self) -> np.ndarray:
        return np.asarray(self.times[self.warmup:] or self.times)

    def summary(self) -> Dict[str, float]:
        s = self.steady
        mean = float(s.mean()) if len(s) else float("nan")
        out = dict(
            mean_s=mean,
            p50_s=float(np.percentile(s, 50)) if len(s) else float("nan"),
            p95_s=float(np.percentile(s, 95)) if len(s) else float("nan"),
            steps=len(self.times),
        )
        if self.num_edges and mean > 0:
            out["edges_per_sec"] = self.num_edges / mean
        return out
