"""Observability utilities: JSONL metric logger, rate counter, profiler
hooks (PARITY 'Tracing/profiling' row; the reference has none, SURVEY §5)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gemm_gan_tpu.utils.metrics import MetricLogger, profile_to, trace_annotation


def test_metric_logger_jsonl_and_curves(tmp_path):
    lg = MetricLogger(str(tmp_path), "t")
    lg.log(1, d_loss=0.5, g_loss=jnp.float32(2.0))
    lg.log(2, d_loss=0.25)
    lg.close()
    path = os.path.join(str(tmp_path), "t_metrics.jsonl")
    recs = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[0]["g_loss"] == 2.0
    xs, vs = lg.curve("d_loss")
    assert xs == [1, 2] and vs == [0.5, 0.25]
    assert lg.steps_per_sec() >= 0.0
    lg.reset_rate()


def test_trace_annotation_wraps_compute():
    with trace_annotation("unit"):
        out = jnp.sum(jnp.arange(8.0))
    assert float(out) == 28.0


def test_profile_to_writes_trace(tmp_path):
    d = str(tmp_path / "prof")
    with profile_to(d):
        float(jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).sum())
    # a plugin/trace event directory must exist under the log dir
    walked = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert walked, "profiler wrote no trace files"
