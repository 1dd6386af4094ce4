"""Profiling / tracing / memory probing.

Replaces the reference's manual wall-clock instrumentation
(``CTRL.PROFILE_ANALYSIS`` prints threaded through forward —
lib/workflow.py:159-234, lib/model.py:311-463, SURVEY.md §5) and the
``check_max_mem`` OOM probe (tools/utils.py:589-642) with:

- :func:`trace` — a ``jax.profiler`` trace context writing TensorBoard-
  compatible traces (XLA op-level timing on TPU);
- :class:`PhaseTimer` — host-side phase timing with the same
  fetch/forward/backward breakdown the reference prints;
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` for custom spans;
- :func:`memory_probe` — run N steps and report live/peak device memory
  (the check_max_mem capability, without the rebuild-the-model dance).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a device profile into ``log_dir`` (view with TensorBoard)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a traced region."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulates wall-clock per phase; prints the reference-style report."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, log_fn: Callable[[str], None] = print):
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            log_fn(f"[profile] {name}: total {total:.3f}s over {n} calls "
                   f"({total / n:.4f}s avg)")


def memory_probe(step_fn: Callable, *args, iters: int = 3,
                 log_fn: Callable[[str], None] = print) -> Optional[dict]:
    """Run ``step_fn`` a few times and report device memory stats.

    Capability parity with check_max_mem (tools/utils.py:589-642): a short
    probe that surfaces peak usage before a long run commits to a config.
    """
    out = None
    for _ in range(iters):
        out = step_fn(*args)
        jax.block_until_ready(out)
    stats = None
    dev = jax.devices()[0]
    if hasattr(dev, "memory_stats"):
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
    if stats:
        in_use = stats.get("bytes_in_use", 0) / 2 ** 30
        peak = stats.get("peak_bytes_in_use", 0) / 2 ** 30
        limit = stats.get("bytes_limit", 0) / 2 ** 30
        log_fn(f"[memory] in_use {in_use:.2f} GiB, peak {peak:.2f} GiB, "
               f"limit {limit:.2f} GiB")
    else:
        log_fn("[memory] device memory stats unavailable on this backend")
    return stats
