"""Multi-process experiment protocol — rank-0 artifacts match single-process.

VERDICT.md round-1 item #2: the reference-parity protocol (periodic
validation, npy dumps, checkpoint + evaluate()) must run on a multi-process
mesh, not just the engine API. This launches TWO real JAX processes running
`Experiment.fit()` + `evaluate()` end-to-end and checks rank 0's artifact
dumps against a single-process run of the identical config on an identically
shaped 4-device mesh.

Exactness story: `Batches(shard_mode="batch")` makes the assembled global
training batches identical to the single-process stream, and
`Experiment._generate_all` reuses the single-process fold_in key schedule per
global batch — so the only divergence left is Gloo-vs-XLA fp reduction order
in the grad psum (same tolerance as tests/test_multihost.py).
"""

import json
import os
import socket
import subprocess
import sys
from glob import glob

import numpy as np

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_experiment_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference(tmp_path):
    import jax

    from _multihost_experiment_worker import build_cfg_and_splits
    from gemm_gan_tpu.cli.experiment import Experiment
    from gemm_gan_tpu.parallel.mesh import make_mesh

    cfg, splits = build_cfg_and_splits(os.path.join(str(tmp_path), "sp"))
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    exp = Experiment(cfg, splits, mesh=mesh)
    results = exp.fit()
    return exp.out_dir, results


def test_two_process_experiment_matches_single_process(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2", str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    sp_dir, sp_results = _single_process_reference(tmp_path)
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-6000:]}"

    mp_dir = os.path.join(str(tmp_path), "mp", "proto")
    # fit() dumps at epoch == t.epochs == 4; the worker's evaluate() derives
    # the same epoch from the restored step and OVERWRITES them with the
    # regenerated equivalents (reference semantics, conditional_gan_concat.py
    # :907) — so the mp side here is evaluate()'s post-restore regeneration,
    # an even stronger restore-fidelity check against the sp fit dumps
    sp_runs = sorted(glob(os.path.join(sp_dir, "test_*_epoch_4")))
    mp_runs = sorted(glob(os.path.join(mp_dir, "test_*_epoch_4")))
    assert len(sp_runs) == len(mp_runs) == 2, (sp_runs, mp_runs)
    for sp_run, mp_run in zip(sp_runs, mp_runs):
        assert os.path.basename(sp_run) == os.path.basename(mp_run)
        for name in ("data_real", "data_gen", "test_real", "test_gen"):
            a = np.load(os.path.join(sp_run, name + ".npy"))
            b = np.load(os.path.join(mp_run, name + ".npy"))
            assert a.shape == b.shape, (name, a.shape, b.shape)
            if name.endswith("_real"):
                np.testing.assert_array_equal(a, b, err_msg=name)
            else:
                # generated: same keys/batches; params differ only by the
                # Gloo-vs-XLA grad-reduction fp order during training
                np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4,
                                           err_msg=name)

    # validation history + curves + checkpoint exist on rank 0
    assert os.path.exists(os.path.join(mp_dir, "val_metrics.json"))
    with open(os.path.join(str(tmp_path), "mp_summary.json")) as f:
        mp_summary = json.load(f)
    assert np.isfinite(mp_summary["fit"]) and np.isfinite(mp_summary["eval"])
    assert abs(sp_results["gamma_mean"] - mp_summary["fit"]) < 0.2
