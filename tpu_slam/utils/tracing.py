"""Profiling harness: XLA trace capture + per-op timing.

The reference had no tracing at all (SURVEY.md §5); here profiling is
first-class: ``profile_trace`` wraps a code region in a jax.profiler trace
(viewable in TensorBoard / Perfetto), ``time_jitted`` measures a compiled
callable the right way (compile excluded, device-synchronized), and
``KernelTimer`` accumulates named region timings for the per-scan metrics
stream.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, with_memory: bool = False):
    """Capture a jax.profiler trace of the enclosed region.

    View with ``tensorboard --logdir <logdir>`` or upload the .trace.json
    to Perfetto. Falls back to a no-op if the profiler cannot start (e.g.
    another trace is active).
    """
    started = False
    try:
        jax.profiler.start_trace(logdir,
                                 create_perfetto_trace=False)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def time_jitted(fn: Callable[..., Any], *args, reps: int = 20,
                warmup: int = 2, **kwargs) -> Dict[str, float]:
    """Wall-time a jitted callable: warm up (compile), sync, then average.

    Returns {"mean_ms", "p50_ms", "min_ms", "reps"}.
    """
    times = []
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "mean_ms": 1e3 * sum(times) / len(times),
        "p50_ms": 1e3 * times[len(times) // 2],
        "min_ms": 1e3 * times[0],
        "reps": reps,
    }


class KernelTimer:
    """Named-region wall timers feeding the metrics stream.

    Usage::

        timer = KernelTimer()
        with timer("downsample"):
            scan = odo.downsample(cloud)
        timer.summary()  # {"downsample": {"total_s": ..., "count": ...}}

    Regions synchronize the device on exit so the numbers mean something
    under async dispatch.
    """

    def __init__(self, sync: bool = True):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._sync = sync

    @contextlib.contextmanager
    def __call__(self, name: str, result: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync and result is not None:
                jax.block_until_ready(result)
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self._totals[k], "count": self._counts[k],
                    "mean_ms": 1e3 * self._totals[k] / max(self._counts[k], 1)}
                for k in self._totals}

    def reset(self):
        self._totals.clear()
        self._counts.clear()
