"""Tracing / profiling / logging subsystem.

The reference has no profiler (SURVEY.md §5.1 — only AverageMeter wall
clocks, StandardizedSpace/base/utilities.py:35-51, and tqdm bars). This
module adds first-class observability:

  * :func:`trace` — jax.profiler context producing Perfetto-compatible
    traces;
  * :class:`AverageMeter` / :class:`Throughput` — the reference's meters
    (base/utilities.py:35-51, arcface utils_callbacks imgs/sec);
  * :class:`MetricLogger` — JSONL metric stream + optional TensorBoard
    (replaces the SummaryWriter usage at talker_trainer.py:623 and
    train_vq.py:108,197-199).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """Profile a region: `with trace('./prof'): step(...)`. View with
    Perfetto / TensorBoard profile plugin."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_trace(logdir: str) -> None:
    """Begin a profiler capture mid-loop (pair with :func:`stop_trace`;
    the Trainer uses this to profile steps k..k+N without tracing the
    first-step compile)."""
    import jax

    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    import jax

    jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler span (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class AverageMeter:
    """Running average (base/utilities.py:35-51)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class Throughput:
    """items/sec with exponential smoothing (arcface CallBackLogging)."""

    def __init__(self, smoothing: float = 0.9):
        self._t = None
        self._rate = 0.0
        self._s = smoothing

    def tick(self, n_items: int) -> float:
        now = time.perf_counter()
        if self._t is not None:
            inst = n_items / max(now - self._t, 1e-9)
            self._rate = self._s * self._rate + (1 - self._s) * inst if self._rate else inst
        self._t = now
        return self._rate


class MetricLogger:
    """Append-only JSONL metrics + optional TensorBoard scalars."""

    def __init__(self, logdir: str, use_tensorboard: bool = False):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": int(step), "time": time.time(), **{
            k: float(v) for k, v in metrics.items()
        }}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
