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


def test_epoch_profile_window_state_machine(tmp_path):
    from gemm_gan_tpu.utils.metrics import EpochProfileWindow

    # no-op when log_dir is None
    w = EpochProfileWindow(None)
    w.on_epoch_end(0)
    w.close()
    assert not w.captured

    # opens after the first epoch seen, closes n_epochs later; clamps n>=1
    d = str(tmp_path / "p")
    w = EpochProfileWindow(d, n_epochs=0)
    assert w.n_epochs == 1
    w.on_epoch_end(3)            # window opens (trace starts)
    assert not w.captured        # still open
    float(jnp.sum(jnp.arange(4.0)))  # some traced work
    w.on_epoch_end(4)            # 1 epoch elapsed -> closes
    assert w.captured
    w.close()                    # idempotent
    walked = [f for _, _, fs in os.walk(d) for f in fs]
    assert walked, "no trace files written"


def test_compile_cache_dir_is_machine_fingerprinted(tmp_path, monkeypatch):
    """XLA:CPU AOT cache entries are host-feature-specific; a cache written
    on one box must not be served to a differently-featured box (VERDICT r2
    weak #1, cpu_aot_loader.cc mismatch / SIGILL). The default cache dir is
    therefore suffixed with a stable fingerprint of the host ISA + CPU flags.
    """
    from gemm_gan_tpu.utils import compile_cache as cc

    fp = cc.machine_fingerprint()
    assert fp == cc.machine_fingerprint(), "fingerprint must be stable"
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)

    # the suite's active cache dir (whatever conftest resolved — possibly
    # via the env override, e.g. a cold-compile measurement) must survive
    # this test; capture it BEFORE mutating so the restore below does not
    # silently re-point later tests at the default warm cache
    suite_dir = jax.config.jax_compilation_cache_dir

    # isolate before asserting defaults
    monkeypatch.delenv("GEMM_GAN_COMPILE_CACHE_DIR", raising=False)
    d = cc.enable_compile_cache()
    assert os.path.basename(d) == fp and os.path.isdir(d)
    # explicit dir still wins (tests/workers that pin a shared dir)
    explicit = str(tmp_path / "cc")
    assert cc.enable_compile_cache(explicit) == explicit
    # env override redirects every entry point at once (cold-compile
    # measurements, CI cache volumes) without touching the default dir
    env_dir = str(tmp_path / "env_cc")
    monkeypatch.setenv("GEMM_GAN_COMPILE_CACHE_DIR", env_dir)
    assert cc.enable_compile_cache() == env_dir and os.path.isdir(env_dir)
    # an explicit dir beats the env var
    assert cc.enable_compile_cache(explicit) == explicit
    monkeypatch.delenv("GEMM_GAN_COMPILE_CACHE_DIR")
    # restore the suite's shared cache for subsequent tests (explicit dir:
    # env-independent, exactly what conftest had configured)
    assert cc.enable_compile_cache(suite_dir) == suite_dir
