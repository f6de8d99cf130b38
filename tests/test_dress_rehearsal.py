"""Execute the assembled dress-rehearsal script end-to-end at toy shapes.

`scripts/dress_rehearsal.py` is the one place the FULL reference protocol
(build on-disk L0/L1 data layout -> load_tcga -> Experiment.fit with periodic
validation -> test dumps -> posthoc utility/privacy -> checkpoint
evaluate()) runs assembled from the on-disk layout up — the on-chip run
records BASELINE.md's "full protocol" row; this test keeps the script itself
executable in CI (reference protocol:
/root/reference/src/conditional_gan_concat.py:575-1110).

Runs the script as a subprocess with --cpu and the scale-down knobs, then
checks the summary contract: every phase timed, artifacts checksummed,
metrics finite.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "scripts", "dress_rehearsal.py")


@pytest.mark.slow
def test_rehearsal_script_end_to_end(tmp_path):
    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # script forces CPU via jax.config
    proc = subprocess.run(
        [sys.executable, "-u", SCRIPT, "--cpu",
         "--data-dir", data_dir, "--out", out_dir,
         "--cases", "96", "--epochs", "2", "--freq", "1",
         "--genes", "40", "--sparse-genes", "8",
         "--patches", "8", "--patch-dim", "16",
         "--tokens", "6", "--text-dim", "12",
         "--n-critic", "2"],
        env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"

    summaries = []
    for root, _, files in os.walk(out_dir):
        if "rehearsal_summary.json" in files:
            summaries.append(os.path.join(root, "rehearsal_summary.json"))
    assert len(summaries) == 1, proc.stdout
    with open(summaries[0]) as f:
        summary = json.load(f)

    # every protocol phase ran and was timed
    for phase in ("build_data", "load_tcga", "build_experiment", "fit",
                  "posthoc_utility", "posthoc_privacy", "evaluate_reload"):
        assert phase in summary["phase_seconds"], summary["phase_seconds"]
        assert summary["phase_seconds"][phase] >= 0

    assert np.isfinite(summary["gamma_mean"])
    assert np.isfinite(summary["eval_gamma_mean"])
    assert summary["artifact_md5"], "no npy artifacts were checksummed"
    # dumps exist on disk where the checksums claim
    run_dir = os.path.dirname(summaries[0])
    for rel in list(summary["artifact_md5"])[:3]:
        assert os.path.exists(os.path.join(run_dir, rel))
