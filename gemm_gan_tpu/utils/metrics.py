"""Training observability: scalar logging, loss curves, profiler hooks.

The reference logs via prints + a per-epoch loss dict
(/root/reference/src/conditional_gan_concat.py:643-658) and had commented-out
wandb calls (:780-781). Here metrics are accumulated host-side into a
JSONL-backed logger with steps/sec counters, and `jax.profiler` trace
annotations are exposed as context managers.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional

import jax
import numpy as np


class MetricLogger:
    def __init__(self, out_dir: Optional[str] = None, run_name: str = "run"):
        self.out_dir = out_dir
        self.run_name = run_name
        self.history: Dict[str, list] = defaultdict(list)
        self._file = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._file = open(os.path.join(out_dir, f"{run_name}_metrics.jsonl"), "a")
        self._t0 = time.perf_counter()
        self._steps_at_t0 = 0
        self._steps = 0

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.perf_counter() - self._t0}
        for k, v in scalars.items():
            v = float(np.asarray(v))
            self.history[k].append((int(step), v))
            rec[k] = v
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        self._steps = step

    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        ds = self._steps - self._steps_at_t0
        return ds / dt if dt > 0 else 0.0

    def reset_rate(self):
        self._t0 = time.perf_counter()
        self._steps_at_t0 = self._steps

    def curve(self, key: str):
        xs = self.history.get(key, [])
        return [s for s, _ in xs], [v for _, v in xs]

    def close(self):
        if self._file:
            self._file.close()


@contextmanager
def trace_annotation(name: str):
    """jax.profiler.TraceAnnotation wrapper (no-op if profiler unavailable)."""
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


@contextmanager
def profile_to(log_dir: str):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
