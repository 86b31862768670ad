"""Tracing / profiling utilities (SURVEY §5.1).

The reference's observability is the KV logger's ``profile_kv`` timers plus
grad/param norms (``src/logger.py:318-348``, ``fp16_util.py:217-225``); the
TPU-native equivalents here add XLA/device-level visibility:

* :func:`trace` — context manager around ``jax.profiler.trace`` producing a
  TensorBoard-loadable device trace (op-level timeline, HBM traffic),
* :func:`annotate` — named ``TraceAnnotation`` scopes visible in the trace,
* :func:`device_memory_stats` — per-device HBM usage,
* :class:`StepTimer` — host-side step-time EMA reported into the KV logger.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any

import jax

from confild_tpu.utils import logger as tlog


@contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in the device trace."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict[str, Any]:
    """Per-device memory stats (bytes in use / peak / limit) where the
    backend reports them."""
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


def log_memory(prefix: str = "mem"):
    for dev, stats in device_memory_stats().items():
        if stats.get("bytes_in_use") is not None:
            tlog.logkv(f"{prefix}_gb", stats["bytes_in_use"] / 2**30)
            break


class StepTimer:
    """EMA step timer; call ``tick()`` once per step."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.last = None
        self.ema = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        if self.last is not None:
            dt = now - self.last
            self.ema = dt if self.ema is None else (
                self.decay * self.ema + (1 - self.decay) * dt)
            tlog.logkv("step_time_s", self.ema)
        self.last = now
        return self.ema
