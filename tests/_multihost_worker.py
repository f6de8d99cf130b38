"""Subprocess worker for the multi-process (multi-host) integration test.

Each worker is ONE JAX process with 2 virtual CPU devices; two workers form
a 4-device global mesh via `distributed_init` (Gloo-backed CPU collectives).
Each feeds the engine its OWN `Batches` process shard — the per-host input
convention of `parallel.sharding.place_batch` — runs a few fused WGAN-GP
steps, and dumps the final (replicated) params for the parent to compare
against a single-process run on the concatenated global batch.

Argv: coordinator_port process_id num_processes out_dir [model_axis] [mode]

model_axis=2 exercises the TP composition: the 4 global devices form a
(data=2, model=2) mesh, so the gene-dim tensor-parallel param shardings and
their collectives run across the multi-process placement path too.

mode="cached" instead drives the SHARDED-BANK streaming scan: each process
contributes its local cases to a `ShardedDeviceCache` (case axis sharded
over `data` via make_array_from_process_local_data) and runs one epoch via
`step_many_cached` — the whole epoch is ONE device program with shard-local
gathers inside the scan body; nothing re-uploads through the host.
"""

import os
import sys


def main():
    port, pid, nproc, out_dir = sys.argv[1:5]
    model_ax = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    mode = sys.argv[6] if len(sys.argv) > 6 else "step"
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
    sys.path.insert(0, os.path.dirname(tests_dir))  # repo root: gemm_gan_tpu
    sys.path.insert(0, tests_dir)                   # conftest (tiny_cfg)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gemm_gan_tpu.parallel.mesh import distributed_init, make_mesh

    distributed_init(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    import numpy as np

    from conftest import tiny_cfg

    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    genes = synthetic_dataset(n=32, n_genes=24, seed=1)["genes"]
    mesh = make_mesh(data=2 * nproc // model_ax, model=model_ax)
    cfg = tiny_cfg("vanilla")
    if mode == "cached":
        from gemm_gan_tpu.data.device_cache import ShardedDeviceCache

        flat_name = f"params_cached_{pid}"
        local = genes[pid * 16:(pid + 1) * 16]  # this process's cases
        cache = ShardedDeviceCache({"genes": local}, batch_size=8,
                                   mesh=mesh, seed=0)
        eng = WGANGPEngine(cfg, steps_per_epoch=len(cache), mesh=mesh)
        # init from a host batch (values don't affect init params, only
        # shapes do) so init stays process-local and identical everywhere
        state = eng.init_state(0, {"genes": np.zeros((8, 24), np.float32)})
        state, metrics = eng.step_many_cached(state, cache, 0)
    else:
        loader = Batches({"genes": genes}, batch_size=4, seed=0, shuffle=False,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
        flat_name = f"params_{pid}" if model_ax == 1 else f"params_tp_{pid}"
        eng = WGANGPEngine(cfg, steps_per_epoch=len(loader), mesh=mesh)
        batch = next(iter(loader))
        state = eng.init_state(0, batch)
        metrics = None
        for _ in range(3):
            state, metrics = eng.step(state, batch)

    leaves = jax.tree_util.tree_leaves_with_path(
        (state.g_params, state.d_params))
    flat = {jax.tree_util.keystr(path): np.asarray(jax.device_get(leaf))
            for path, leaf in leaves}
    flat["__d_loss__"] = np.asarray(float(metrics["d_loss"]))
    np.savez(os.path.join(out_dir, flat_name + ".npz"), **flat)
    print(f"worker {pid}: OK d_loss={float(metrics['d_loss']):.5f}")


if __name__ == "__main__":
    main()
