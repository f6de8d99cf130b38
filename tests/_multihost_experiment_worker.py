"""Subprocess worker: the FULL experiment protocol on a 2-process mesh.

Each worker is one JAX process with 2 virtual CPU devices (4-device global
mesh). Both construct the same `Experiment` (full splits everywhere, the
multi-process contract) and run `fit()` — process-sharded training, sharded
generation, rank-0-only validation/dumps/checkpoint — then `evaluate()`
(collective Orbax restore + rank-0 test block). The parent compares rank 0's
artifact dir against a single-process run of the identical config.

Argv: coordinator_port process_id num_processes out_dir
"""

import json
import os
import sys


def build_cfg_and_splits(out_dir: str):
    """Shared by the 2-process workers and the single-process reference run
    in the parent test — identical config + splits on both sides."""
    import dataclasses

    from conftest import tiny_cfg
    from gemm_gan_tpu.data.synthetic import synthetic_dataset

    cfg = tiny_cfg("vanilla")
    cfg = dataclasses.replace(
        cfg,
        output_dir=out_dir, run_name="proto",
        train=dataclasses.replace(cfg.train, epochs=4, freq_compute_test=2,
                                  batch_size=8),
        eval=dataclasses.replace(cfg.eval, n_runs=2, pr_nhood_sizes=()),
    )
    genes = synthetic_dataset(n=48, n_genes=24, seed=1)["genes"]
    splits = {
        "train": {"genes": genes[:32]},
        "val": {"genes": genes[32:40]},
        "test": {"genes": genes[40:]},
    }
    return cfg, splits


def main():
    port, pid, nproc, out_dir = sys.argv[1:5]
    pid, nproc = int(pid), int(nproc)
    os.environ["JAX_PLATFORMS"] = "cpu"
    # same flag policy as the parent suite (tests/_xla_test_flags.py): the
    # parent compares these workers' results bitwise against in-suite runs,
    # so EVERY codegen-affecting flag a user pins via XLA_FLAGS must apply
    # here exactly as in-suite — pass the full inherited set through, minus
    # only the device-count flag (rebuilt for 2 virtual devices).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _xla_test_flags import build_xla_flags

    inherited = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = build_xla_flags(2, base=" ".join(inherited))

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(tests_dir))
    sys.path.insert(0, tests_dir)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gemm_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # share the suite's warm fused-step cache

    from gemm_gan_tpu.parallel.mesh import distributed_init, make_mesh

    distributed_init(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    from gemm_gan_tpu.cli.experiment import Experiment

    cfg, splits = build_cfg_and_splits(os.path.join(out_dir, "mp"))
    mesh = make_mesh(data=2 * nproc, model=1)
    exp = Experiment(cfg, splits, mesh=mesh)
    results = exp.fit()
    reeval = exp.evaluate()
    if pid == 0:
        assert results and "gamma_mean" in results, results
        assert reeval and "gamma_mean" in reeval, reeval
        with open(os.path.join(out_dir, "mp_summary.json"), "w") as f:
            json.dump({"fit": results["gamma_mean"],
                       "eval": reeval["gamma_mean"]}, f)
    else:
        assert results == {} and reeval == {}, (results, reeval)
    print(f"experiment worker {pid}: OK")


if __name__ == "__main__":
    main()
