"""Tracing and per-step timing.

The reference has no profiling support beyond ad-hoc time() captures
(SURVEY.md §5); here: a jax.profiler trace context usable from the CLI
(--trace_dir) and a lightweight step timer whose readings survive the
remote-TPU tunnel (forced host readbacks — block_until_ready can return
early through it).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace wrapper; no-op when log_dir is falsy.

    View with tensorboard --logdir <log_dir> (or xprof)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock section timer with mean/p50/p95 summaries."""

    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)
        self._open: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            float(sync_value)  # force device completion
        self._samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for name, xs in self._samples.items():
            a = np.asarray(xs[1:] or xs)  # drop the compile-heavy first step
            out[name] = {
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "count": len(xs),
            }
        return out

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v['mean_ms']:.1f}ms (p95 {v['p95_ms']:.1f})"
            for k, v in self.summary().items()
        )
