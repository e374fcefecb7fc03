"""Structured stage timing / profiling.

Replaces the reference's ad-hoc prints (timeit brackets in
extraction_latent.py:81-216, chrono phase buckets in matcher.cpp:34-44 and
:715-720) with a structured PhaseTimer: named buckets accumulate across
calls, report as a dict or pretty table, and optionally wrap a
``jax.profiler`` trace for device-level inspection.
"""
from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Iterator, Optional


class PhaseTimer:
    """Accumulating named phase buckets (the matcher's 'minutiae
    similarity' / 'obtaining corr' / 'second order ...' concept)."""

    def __init__(self):
        self.buckets: "OrderedDict[str, float]" = OrderedDict()
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.buckets[name] = self.buckets.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return dict(self.buckets)

    def pretty(self) -> str:
        total = sum(self.buckets.values()) or 1.0
        lines = [f"{'phase':<32}{'total s':>10}{'calls':>8}{'%':>7}"]
        for k, v in self.buckets.items():
            lines.append(f"{k:<32}{v:>10.3f}{self.counts[k]:>8}"
                         f"{100 * v / total:>6.1f}%")
        return "\n".join(lines)

    def reset(self) -> None:
        self.buckets.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
