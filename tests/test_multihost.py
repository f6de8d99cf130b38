"""Multi-process (multi-host) data-parallel training — real 2-process test.

The reference has no distributed backend at all (SURVEY.md §2.5); the
multi-host story here is `parallel.mesh.distributed_init` + per-host input
shards assembled by `parallel.sharding.place_batch`. This test launches TWO
actual JAX processes (2 virtual CPU devices each, Gloo collectives), trains
the vanilla WGAN-GP for 3 fused steps on a 4-device global mesh with each
process feeding only its own `Batches` shard, and checks:

- both processes end with identical (replicated) params, and
- those params match a single-process 4-device run on the concatenated
  global batch (same placement `place_batch` produces multi-process:
  [proc0 rows, proc1 rows]).
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_workers(tmp_path, model_ax, mode="step"):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2", str(tmp_path),
             str(model_ax), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    stem = ("params_cached" if mode == "cached"
            else "params" if model_ax == 1 else "params_tp")
    return [dict(np.load(tmp_path / f"{stem}_{i}.npz")) for i in range(2)]


def _single_process_reference(model_ax):
    """The same 3 steps on this process's own 4 virtual devices, fed the
    concatenated global batch in place_batch's multi-process layout."""
    import jax

    from conftest import tiny_cfg
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.parallel.mesh import make_mesh
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    genes = synthetic_dataset(n=32, n_genes=24, seed=1)["genes"]
    shards = [next(iter(Batches({"genes": genes}, batch_size=4, seed=0,
                                shuffle=False, process_index=i,
                                process_count=2)))["genes"]
              for i in range(2)]
    batch = {"genes": np.concatenate(shards)}
    mesh = make_mesh(data=4 // model_ax, model=model_ax,
                     devices=jax.devices()[:4])
    cfg = tiny_cfg("vanilla")
    # steps_per_epoch must match the workers' len(loader)=4 (32 samples /
    # 8 global batch): the LR halving schedule is a function of
    # step // steps_per_epoch, so a mismatch here would surface as a fake
    # "collectives divergence" once the test runs enough steps to halve
    eng = WGANGPEngine(cfg, steps_per_epoch=4, mesh=mesh)
    state = eng.init_state(0, batch)
    metrics = None
    for _ in range(3):
        state, metrics = eng.step(state, batch)
    ref = {jax.tree_util.keystr(path): np.asarray(jax.device_get(leaf))
           for path, leaf in jax.tree_util.tree_leaves_with_path(
               (state.g_params, state.d_params))}
    ref["__d_loss__"] = np.asarray(float(metrics["d_loss"]))
    return ref


def _check(got, ref):
    for k in got[0]:
        np.testing.assert_allclose(got[0][k], got[1][k], rtol=0, atol=0,
                                   err_msg=f"rank disagreement on {k}")
    for k, v in ref.items():
        # Gloo cross-process allreduce vs single-process XLA reduce can
        # differ in fp summation order; params stay within fp tolerance
        np.testing.assert_allclose(got[0][k], v, rtol=5e-4, atol=1e-5,
                                   err_msg=k)


def test_two_process_dp_matches_single_process(tmp_path):
    _check(_spawn_workers(tmp_path, model_ax=1),
           _single_process_reference(model_ax=1))


def test_two_process_dp_tp_matches_single_process(tmp_path):
    """(data=2, model=2): DP across the two processes, gene-dim tensor
    parallelism within each — TP param placement and its collectives ride
    the multi-process path too."""
    _check(_spawn_workers(tmp_path, model_ax=2),
           _single_process_reference(model_ax=2))


def _single_process_cached_reference():
    """The same sharded-bank epoch scan on this process's own 4 virtual
    devices: identical mesh shape and cache seed, so the per-shard on-device
    permutations and the bank partition match the 2-process run exactly."""
    import jax

    from conftest import tiny_cfg
    from gemm_gan_tpu.data.device_cache import ShardedDeviceCache
    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.parallel.mesh import make_mesh
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    genes = synthetic_dataset(n=32, n_genes=24, seed=1)["genes"]
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    cache = ShardedDeviceCache({"genes": genes}, batch_size=8, mesh=mesh,
                               seed=0)
    cfg = tiny_cfg("vanilla")
    eng = WGANGPEngine(cfg, steps_per_epoch=len(cache), mesh=mesh)
    state = eng.init_state(0, {"genes": np.zeros((8, 24), np.float32)})
    state, metrics = eng.step_many_cached(state, cache, 0)
    ref = {jax.tree_util.keystr(path): np.asarray(jax.device_get(leaf))
           for path, leaf in jax.tree_util.tree_leaves_with_path(
               (state.g_params, state.d_params))}
    ref["__d_loss__"] = np.asarray(float(metrics["d_loss"]))
    return ref


def test_two_process_sharded_cache_scan_matches_single_process(tmp_path):
    """The sharded-bank streaming scan is the multi-process form of the
    epoch-scan fit loop: each process contributes its cases to the
    data-axis-sharded bank ONCE, and one epoch of fused steps runs as one
    device program with shard-local gathers. Both ranks must agree bitwise
    and match the single-process run of the identical mesh shape."""
    _check(_spawn_workers(tmp_path, model_ax=1, mode="cached"),
           _single_process_cached_reference())
