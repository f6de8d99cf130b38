"""Multi-device tests on the virtual 8-CPU mesh: DP/TP train step parity,
TP rule application (the reference has no distributed story, SURVEY.md §2.5)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.parallel.mesh import make_mesh
from gemm_gan_tpu.parallel.sharding import param_shardings
from gemm_gan_tpu.train.wgan import WGANGPEngine


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_tp_rules_target_gene_matmuls(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")
    mesh = make_mesh(data=4, model=2)
    eng = WGANGPEngine(cfg, steps_per_epoch=2, mesh=mesh)
    loader = Batches({"genes": tiny_data["genes"]}, batch_size=8, seed=0)
    state = eng.init_state(0, next(iter(loader)))
    gs = param_shardings(mesh, state.g_params, cfg.model.n_genes)
    # generator output projection shards its out dim
    out_kernel = gs["trunk"]["Dense_0"]["kernel"]
    assert out_kernel.spec == P(None, "model")
    ds = param_shardings(mesh, state.d_params, cfg.model.n_genes)
    first = ds["trunk"]["LinearBlock_0"]["Dense_0"]["kernel"]
    assert first.spec == P("model", None)


@pytest.mark.parametrize("variant", ["vanilla", "film_cross_attention"])
def test_dp_tp_step_matches_single_device(variant, tiny_data, make_tiny_cfg):
    """One fused step on the 4x2 mesh must match the unsharded step bitwise-ish."""
    cfg = make_tiny_cfg(variant)
    loader = Batches(tiny_data, batch_size=8, seed=0, shuffle=False)
    batch = next(iter(loader))

    eng1 = WGANGPEngine(cfg, steps_per_epoch=2)
    s1 = eng1.init_state(0, batch)
    s1, m1 = eng1.step(s1, batch)

    mesh = make_mesh(data=4, model=2)
    eng2 = WGANGPEngine(cfg, steps_per_epoch=2, mesh=mesh)
    s2 = eng2.init_state(0, batch)
    s2, m2 = eng2.step(s2, batch)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    p1 = jax.device_get(s1.g_params)
    p2 = jax.device_get(s2.g_params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5),
                 p1, p2)


def test_data_only_mesh(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")
    mesh = make_mesh()  # 8 x 1
    eng = WGANGPEngine(cfg, steps_per_epoch=2, mesh=mesh)
    loader = Batches({"genes": tiny_data["genes"]}, batch_size=16, seed=0)
    batch = next(iter(loader))
    state = eng.init_state(0, batch)
    state, m = eng.step(state, batch)
    assert np.isfinite(float(m["d_loss"]))


def test_step_many_on_mesh_matches_sequential(tiny_data, make_tiny_cfg):
    """The production fit path — `lax.scan` of K fused steps — on the 4x2
    mesh must match K sequential single-device steps (same stacked batches)."""
    cfg = make_tiny_cfg("film")
    loader = Batches(tiny_data, batch_size=8, seed=0, shuffle=False)
    stacked = loader.stacked_epoch(0)
    K = next(iter(stacked.values())).shape[0]
    assert K >= 2

    eng1 = WGANGPEngine(cfg, steps_per_epoch=K)
    s1 = eng1.init_state(0, {k: v[0] for k, v in stacked.items()})
    m1 = None
    for i in range(K):
        s1, m1 = eng1.step(s1, {k: v[i] for k, v in stacked.items()})

    mesh = make_mesh(data=4, model=2)
    eng2 = WGANGPEngine(cfg, steps_per_epoch=K, mesh=mesh)
    s2 = eng2.init_state(0, {k: v[0] for k, v in stacked.items()})
    s2, m2 = eng2.step_many(s2, stacked)

    # torch-semantics RMSprop takes ~10x larger early steps (eps outside the
    # sqrt), amplifying benign cross-device reduction-order noise — hence the
    # looser tolerance than the single-step parity tests
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-2,
                                   atol=5e-4, err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-2, atol=5e-4),
                 jax.device_get(s1.g_params), jax.device_get(s2.g_params))


def test_sampling_on_mesh_matches_single_device(tiny_data, make_tiny_cfg):
    """Serving rides the mesh too: `generate_samples` and the scanned
    `generate_samples_all` path from a DP+TP-sharded state must match the
    single-device outputs (same keys -> same z draws; only the matmul
    sharding differs)."""
    cfg = make_tiny_cfg("film_cross_attention")
    loader = Batches(tiny_data, batch_size=8, seed=0, shuffle=False)
    batches = list(loader.epoch(0))
    key = jax.random.key(3)

    eng1 = WGANGPEngine(cfg, steps_per_epoch=2)
    s1 = eng1.init_state(0, batches[0])
    one1 = np.asarray(eng1.generate_samples(s1, key, batches[0]))
    all1 = eng1.generate_samples_all(s1, key, batches, num_repeats=2, scan=True)

    mesh = make_mesh(data=4, model=2)
    eng2 = WGANGPEngine(cfg, steps_per_epoch=2, mesh=mesh)
    s2 = eng2.init_state(0, batches[0])
    one2 = np.asarray(eng2.generate_samples(s2, key, batches[0]))
    all2 = eng2.generate_samples_all(s2, key, batches, num_repeats=2, scan=True)

    np.testing.assert_allclose(one1, one2, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(all1["fake"], all2["fake"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(all1["real"], all2["real"])


def test_step_many_cached_on_mesh_matches_single_device(tiny_data, make_tiny_cfg):
    """The streaming scan path shards its in-scan-assembled batches over
    `data` (with_sharding_constraint) and replicates the bank — one epoch on
    the 4x2 mesh must match the single-device streaming run."""
    from gemm_gan_tpu.data.device_cache import DeviceCache

    cfg = make_tiny_cfg("film", train_kw=dict(n_critic=2))

    def run(mesh):
        dev = DeviceCache(tiny_data, batch_size=8, num_patches=4, seed=0)
        eng = WGANGPEngine(cfg, steps_per_epoch=dev.n_full_batches, mesh=mesh)
        state = eng.init_state(0, next(iter(dev.epoch(0))))
        state, m = eng.step_many_cached(state, dev, 0)
        return jax.device_get(state), {k: float(v) for k, v in m.items()}

    s1, m1 = run(None)
    s2, m2 = run(make_mesh(data=4, model=2))
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=2e-3, atol=5e-5,
                                   err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-2,
                                                         atol=5e-4),
                 s1.g_params, s2.g_params)


def test_opt_state_accumulators_shard_like_params(tiny_data, make_tiny_cfg):
    """Optimizer accumulators mirror the param pytree, so the gene-dim
    leaves must carry the SAME tensor-parallel shardings as the params they
    track — a replicated opt state would store full gene-dim accumulators
    on every device and all-gather gradient-sized data over `model` each
    step."""
    import jax

    from gemm_gan_tpu.parallel.mesh import make_mesh
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    mesh = make_mesh(data=4, model=2)
    cfg = make_tiny_cfg("vanilla")
    eng = WGANGPEngine(cfg, steps_per_epoch=2, mesh=mesh)
    batch = {"genes": tiny_data["genes"][:8]}
    state = eng.init_state(0, batch)

    def specs_by_shape(tree):
        out = {}
        for leaf in jax.tree.leaves(tree):
            out.setdefault(tuple(leaf.shape), set()).add(
                tuple(leaf.sharding.spec))
        return out

    p = specs_by_shape((state.g_params, state.d_params))
    o = specs_by_shape((state.g_opt_state, state.d_opt_state))
    # every param-shaped opt leaf (nu accumulators) matches its param spec —
    # in particular the sharded gene-dim kernels/biases
    sharded_shapes = {s for s, specs in p.items()
                     if any(any(ax is not None for ax in sp) for sp in specs)}
    assert sharded_shapes, "expected TP-sharded gene-dim params"
    for shape in sharded_shapes:
        assert shape in o, f"no opt accumulator for sharded param {shape}"
        assert o[shape] == p[shape], (shape, p[shape], o[shape])
    # one mesh step still runs (numerics vs single-device pinned elsewhere)
    state, m = eng.step(state, batch)
    import numpy as np
    assert np.isfinite(float(jax.device_get(m["d_loss"])))
