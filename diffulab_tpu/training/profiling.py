"""Tracing / profiling utilities (SURVEY.md §5.1: absent in the reference —
its only visibility is tqdm bars; the TPU rebuild gets first-class tools).

- :func:`trace` — context manager around ``jax.profiler.start_trace`` writing
  an xplane dump viewable in TensorBoard / XProf;
- :class:`StepTimer` — ``jax.block_until_ready``-bounded steady-state step
  timing with compile-time exclusion and percentile summaries;
- :func:`annotate` — ``jax.named_scope`` pass-through so model blocks show up
  named in profiles.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import numpy as np

annotate = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str | Path, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture an XLA trace (xplane) for TensorBoard/XProf."""
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state step timing: first ``warmup`` calls (compilation, cold
    caches) are excluded; every timed region ends with ``block_until_ready``.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self, result_fn: Callable[[], Any] | None = None) -> Iterator[None]:
        start = time.perf_counter()
        yield
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(time.perf_counter() - start)

    def time_fn(self, fn: Callable[..., Any], *args: Any, n_iters: int = 20, **kwargs: Any) -> dict[str, float]:
        """Time a jitted function: returns mean/p50/p90 seconds and throughput helpers."""
        out = fn(*args, **kwargs)  # compile
        jax.block_until_ready(out)
        for _ in range(self.warmup):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        arr = np.asarray(times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "min_s": float(arr.min()),
        }

    @property
    def summary(self) -> dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
        }
