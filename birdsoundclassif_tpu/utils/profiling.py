"""Tracing & profiling — a first-class observability module.

The reference has no tracing at all (only tqdm progress bars; the DETR
MetricLogger in nets/util/misc.py:27-246 is dead code). This module
provides:
  * Timer / StageTimes: wall-clock per pipeline stage with device sync
  * trace(): context manager around jax.profiler for TensorBoard traces
  * SmoothedValue / MetricLogger: windowed metric smoothing equivalent to
    the reference's (dead) utilities, for training-loop telemetry
  * device_memory_stats(): per-device HBM usage
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict, deque
from typing import Dict, Iterator, Optional

import jax


class Timer:
    """Accumulating wall-clock timer; `sync=True` blocks on device work so
    the measured interval covers it."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(1, self.counts[k]),
            }
            for k in self.totals
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2, sort_keys=True)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace for TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SmoothedValue:
    """Windowed median/avg of a scalar stream (reference analog:
    misc.py:27-81, reimplemented without torch)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(1, self.count)

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable, print_freq: int, header: str = ""):
        start = time.perf_counter()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        t_prev = time.perf_counter()
        for i, obj in enumerate(iterable):
            yield obj
            now = time.perf_counter()
            iter_time.update(now - t_prev)
            t_prev = now
            if i % print_freq == 0:
                print(f"{header} [{i}] {self}  time: {iter_time}")
        total = time.perf_counter() - start
        print(f"{header} Total time: {total:.1f}s")


def device_memory_stats() -> Dict[str, Dict]:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
