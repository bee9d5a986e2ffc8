"""Profiling and metric-logging utilities.

Replaces the reference's wall-clock instrumentation — ``time_per_batch``
prints in ``main.py:216-232`` and the torchvision-tutorial ``MetricLogger``/
``SmoothedValue`` (``/root/reference/detector/utils.py:31-232``) — with a
numpy-based smoothed-metric logger plus first-class ``jax.profiler`` trace
capture (the reference has no tracer integration, SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Dict, Iterator, Optional

import numpy as np


class SmoothedValue:
    """Windowed median/avg tracker (detector/utils.py:31-74, minus the
    torch.distributed sync — metric aggregation across hosts goes through
    jax collectives, not pickled tensors)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} "
                 "({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg)


class MetricLogger:
    """log_every-style iteration logger (detector/utils.py:146-232)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}"
                                   for k, m in self.meters.items())

    def log_every(self, iterable, print_freq: int,
                  header: str = "") -> Iterator:
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for i, obj in enumerate(iterable):
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            end = time.time()
            if i % print_freq == 0:
                print(f"{header} [{i}]  {self}  time: {iter_time}  "
                      f"data: {data_time}")


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None, name: str = "sgg_step"):
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto).

    Usage::
        with trace("/tmp/sgg_trace"):
            state, m = train_step(state, batch, key)
            jax.block_until_ready(m)
    """
    import jax
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
