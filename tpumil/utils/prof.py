"""Profiling and observability.

The reference's only observability is carriage-return stdout counters and
TensorBoard scalars in SimCLR (SURVEY.md section 5). This module provides:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    TensorBoard-viewable device traces;
  * ``ThroughputMeter`` — windowed items/sec counters (patches/sec,
    bags/sec, slides/min);
  * ``ScalarLogger`` — JSONL scalar stream with optional TensorBoard event
    files (when TensorFlow is importable).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir`` (view with
    TensorBoard's profile plugin or xprof)."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Windowed throughput counter."""

    def __init__(self, unit: str = "items", window: int = 50):
        self.unit = unit
        self._events = deque(maxlen=window)
        self.total = 0
        self._t0 = time.perf_counter()

    def add(self, n: int) -> None:
        self._events.append((time.perf_counter(), n))
        self.total += n

    @property
    def rate(self) -> float:
        """items/sec over the window."""
        if len(self._events) < 2:
            return 0.0
        t_first = self._events[0][0]
        t_last = self._events[-1][0]
        n = sum(c for _, c in list(self._events)[1:])
        return n / max(t_last - t_first, 1e-9)

    @property
    def mean_rate(self) -> float:
        return self.total / max(time.perf_counter() - self._t0, 1e-9)

    def __str__(self) -> str:
        return f"{self.rate:.1f} {self.unit}/s (mean {self.mean_rate:.1f})"


class ScalarLogger:
    """Scalars to JSONL (always) and TensorBoard events (when TF exists) —
    the role of the reference's SummaryWriter (simclr/simclr.py:36,104-105)."""

    def __init__(self, logdir: str, tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # noqa: F401

                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None

    def log(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "time": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.scalar(tag, value, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
