"""Profiling / timing instrumentation.

The reference has no profiler (SURVEY.md §5 — only a wall-clock
exec_time.log).  Here: jax.profiler trace capture around any step function,
plus a lightweight phase timer for the data/compute pipeline balance that
the crops/sec target demands.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate wall-clock per named phase; report mean/total."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
                "count": self.counts[name],
            }
            for name in self.totals
        }

    def __str__(self) -> str:
        return " | ".join(
            f"{k}: {v['mean_ms']:.1f}ms x{v['count']}"
            for k, v in self.report().items()
        )


def device_memory_stats() -> Optional[Dict[str, float]]:
    """Per-device HBM usage in GiB (None if the backend lacks stats)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return None
        gib = 1024 ** 3
        return {
            "bytes_in_use_gib": stats.get("bytes_in_use", 0) / gib,
            "peak_bytes_in_use_gib": stats.get("peak_bytes_in_use", 0) / gib,
            "bytes_limit_gib": stats.get("bytes_limit", 0) / gib,
        }
    except Exception:
        return None


def enable_compile_cache(path: str = "/root/.cache/jax_comp") -> None:
    """Persistent XLA compile cache: ViT-H-scale compiles take minutes over
    a remote-compile tunnel; the cache makes re-runs start in seconds.
    Call from CLIs before any jit executes."""
    import os

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - config name drift
        pass
