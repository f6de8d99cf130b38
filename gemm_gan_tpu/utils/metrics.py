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


# --------------------------------------------------------------- trace tables
def aggregate_device_trace(log_dir: str):
    """Aggregate the newest profiler trace under `log_dir` into
    where-does-the-time-go tables for the DEVICE "XLA Ops" rows.

    The reference has no profiling story at all (SURVEY.md §5); here a
    `profile_to`/`--profile_dir` capture feeds this aggregator, which works
    on the tunneled TPU backend too (device-side op events are reported).

    Returns a dict with keys `by_category`, `by_source`, `by_op` (each
    mapping key -> [total_us, count, model_flops, bytes_accessed]),
    `module_us` (total "XLA Modules" row time), and `trace_path`.
    """
    import glob
    import gzip
    from collections import defaultdict

    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz found under {log_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    device_pids = {p for p, n in pid_names.items() if "device" in n.lower()}
    op_rows = {k for k, n in tid_names.items()
               if k[0] in device_pids and n == "XLA Ops"}
    module_rows = {k for k, n in tid_names.items()
                   if k[0] in device_pids and n == "XLA Modules"}

    def bucket():
        return [0.0, 0, 0.0, 0.0]  # us, count, flops, bytes

    out = {"by_category": defaultdict(bucket), "by_source": defaultdict(bucket),
           "by_op": defaultdict(bucket), "module_us": 0.0,
           "trace_path": paths[-1]}
    for e in events:
        if e.get("ph") != "X":
            continue
        k = (e.get("pid"), e.get("tid"))
        if k in module_rows:
            out["module_us"] += float(e.get("dur", 0.0))
        if k not in op_rows:
            continue
        a = e.get("args", {})
        dur = float(e.get("dur", 0.0))
        flops = float(a.get("model_flops", 0) or 0)
        nbytes = float(a.get("bytes_accessed", 0) or 0)
        src = a.get("source", "?")
        src = "/".join(src.split("/")[-2:]) if src != "?" else "?"
        for agg, key in ((out["by_category"], a.get("hlo_category", "?")),
                         (out["by_source"], src),
                         (out["by_op"], e.get("name", "?"))):
            b = agg[key]
            b[0] += dur
            b[1] += 1
            b[2] += flops
            b[3] += nbytes
    return out


def format_device_table(agg: dict, title: str, topk: int = 20,
                        per: float = 1.0) -> str:
    """Render one aggregate (e.g. `by_source`) as a text table.

    `per` divides the times (e.g. number of traced steps -> ms/step).
    GFLOP/s and GB/s columns are achieved rates per op-active-time, the
    roofline position of each bucket.
    """
    lines = [f"-- {title} {'':<36}{'ms':>9}{'count':>8}{'GFLOP/s':>9}{'GB/s':>8}"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    for name, (us, cnt, fl, by) in rows[:topk]:
        gfs = fl / us / 1e3 if us else 0.0
        gbs = by / us / 1e3 if us else 0.0
        lines.append(f"{str(name)[:44]:<48}{us / 1e3 / per:>9.3f}{cnt:>8}"
                     f"{gfs:>9.1f}{gbs:>8.1f}")
    rest = sum(v[0] for _, v in rows[topk:])
    if rest:
        lines.append(f"{'(rest)':<48}{rest / 1e3 / per:>9.3f}")
    return "\n".join(lines)


class EpochProfileWindow:
    """Steady-state `jax.profiler` capture over training epochs.

    Opens the trace after the FIRST completed epoch seen (that epoch's XLA
    compiles are excluded) and closes it `n_epochs` (min 1) epochs later.
    Shared by the GAN and VAE experiment fit loops: call `on_epoch_end(e)`
    from the epoch callback and `close()` in a finally block. A no-op when
    `log_dir` is None. Needs >= 2 epochs to capture anything.
    """

    def __init__(self, log_dir: Optional[str], n_epochs: int = 1):
        self.log_dir = log_dir
        self.n_epochs = max(1, int(n_epochs))
        self._first = None
        self._on = False

    def on_epoch_end(self, epoch: int):
        if self.log_dir is None:
            return
        if self._first is None:
            self._first = epoch
            jax.profiler.start_trace(self.log_dir)
            self._on = True
        elif self._on and epoch >= self._first + self.n_epochs:
            self.close()

    def close(self):
        if self._on:
            jax.profiler.stop_trace()
            self._on = False

    @property
    def captured(self) -> bool:
        """True once a window has been opened AND closed around >=1 epoch."""
        return self._first is not None and not self._on
