"""DeviceCache: on-device batch assembly + fresh per-step patch subsampling."""

import jax
import numpy as np
import pytest

from gemm_gan_tpu.data.device_cache import DeviceCache, _subsample_patches
from gemm_gan_tpu.data.loader import Batches


def _data(rng, n=24, P=16, D=8):
    lens = rng.randint(1, P + 1, n)
    mask = np.arange(P)[None, :] < lens[:, None]
    patches = rng.randn(n, P, D).astype(np.float32) * mask[..., None]
    return {
        "genes": rng.randn(n, 6).astype(np.float32),
        "patches": patches, "patch_mask": mask,
        "disease": rng.randint(0, 3, n).astype(np.int32),
    }


def test_matches_host_batches_without_resampling(rng):
    data = _data(rng)
    host = Batches(data, batch_size=8, seed=3, shuffle=True)
    dev = DeviceCache(data, batch_size=8, seed=3, shuffle=True)
    for hb, db in zip(host.epoch(5), dev.epoch(5)):
        for k in hb:
            np.testing.assert_array_equal(hb[k], np.asarray(db[k]), err_msg=k)


def test_subsample_selects_only_valid(rng):
    P, num = 16, 4
    data = _data(rng, n=8, P=P)
    sub, sub_mask = _subsample_patches(
        jax.numpy.asarray(data["patches"]), jax.numpy.asarray(data["patch_mask"]),
        jax.random.key(0), num)
    sub, sub_mask = np.asarray(sub), np.asarray(sub_mask)
    assert sub.shape == (8, num, 8)
    for i in range(8):
        n_valid = data["patch_mask"][i].sum()
        # selected count = min(valid, num); the rest masked + zeroed
        assert sub_mask[i].sum() == min(n_valid, num)
        assert np.allclose(sub[i][~sub_mask[i]], 0.0)
        # every selected row must come from the valid set
        valid_rows = data["patches"][i][data["patch_mask"][i]]
        for row in sub[i][sub_mask[i]]:
            assert any(np.allclose(row, vr) for vr in valid_rows)


def test_resampling_is_fresh_per_step_and_reproducible(rng):
    data = _data(rng, n=16, P=16)
    dev = DeviceCache(data, batch_size=8, num_patches=4, seed=0, shuffle=False)
    e0 = [np.asarray(b["patches"]) for b in dev.epoch(0)]
    e1 = [np.asarray(b["patches"]) for b in dev.epoch(1)]
    assert not np.allclose(e0[0], e1[0])  # fresh subsets across epochs
    e0b = [np.asarray(b["patches"]) for b in dev.epoch(0)]
    np.testing.assert_array_equal(e0[0], e0b[0])  # same epoch -> bitwise same


def test_engine_accepts_device_cache_batches(tiny_data, make_tiny_cfg):
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    cfg = make_tiny_cfg("film")
    dev = DeviceCache(tiny_data, batch_size=8, num_patches=4, seed=0)
    eng = WGANGPEngine(cfg, steps_per_epoch=len(dev))
    batch = next(iter(dev))
    state = eng.init_state(0, batch)
    state, m = eng.step(state, batch)
    assert np.isfinite(float(m["d_loss"]))


def test_embedding_store_dtype_bf16():
    """bf16 bank storage: embeddings stored narrow, batches emerge f32
    within bf16 quantization error; genes/masks/labels stored exactly."""
    import jax.numpy as jnp

    from gemm_gan_tpu.data.device_cache import DeviceCache
    from gemm_gan_tpu.data.synthetic import synthetic_dataset

    data = synthetic_dataset(n=24, n_genes=12, num_patches=8, patch_dim=16,
                             num_tokens=6, text_dim=12, seed=3)
    cache = DeviceCache(data, batch_size=8, seed=0, shuffle=False,
                        embedding_store_dtype=jnp.bfloat16)
    assert cache.arrays["patches"].dtype == jnp.bfloat16
    assert cache.arrays["tokens"].dtype == jnp.bfloat16
    assert cache.arrays["genes"].dtype == jnp.float32
    batch = next(iter(cache.epoch(0)))
    assert batch["patches"].dtype == jnp.float32
    assert batch["tokens"].dtype == jnp.float32
    # identity epoch order (shuffle=False): compare against the source
    np.testing.assert_array_equal(np.asarray(batch["genes"]),
                                  data["genes"][:8])
    np.testing.assert_allclose(np.asarray(batch["patches"]),
                               data["patches"][:8], atol=0.02, rtol=0.01)
    # stacked path too
    stacked = cache.stacked_epoch(0)
    assert stacked["patches"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(stacked["genes"][0]),
                                  data["genes"][:8])


def test_step_many_cached_matches_stacked(tiny_data, make_tiny_cfg):
    """`step_many_cached` (batches gathered from the HBM bank INSIDE the
    scan body — O(bank + one batch) memory) must match
    `step_many(stacked_epoch(e))` (whole-epoch gather materialized): same
    epoch spec, same assembler, so the training is identical."""
    import jax

    from gemm_gan_tpu.train.wgan import WGANGPEngine

    cfg = make_tiny_cfg("film", train_kw=dict(n_critic=2))

    def run(cached):
        dev = DeviceCache(tiny_data, batch_size=8, num_patches=4, seed=0)
        eng = WGANGPEngine(cfg, steps_per_epoch=dev.n_full_batches)
        state = eng.init_state(0, next(iter(dev.epoch(0))))
        if cached:
            state, m = eng.step_many_cached(state, dev, 0)
            state, m = eng.step_many_cached(state, dev, 1)
        else:
            state, m = eng.step_many(state, dev.stacked_epoch(0))
            state, m = eng.step_many(state, dev.stacked_epoch(1))
        return jax.device_get(state), {k: float(v) for k, v in m.items()}

    s_stacked, m_stacked = run(False)
    s_cached, m_cached = run(True)
    for k in m_stacked:
        np.testing.assert_allclose(m_stacked[k], m_cached[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        s_stacked.g_params, s_cached.g_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        s_stacked.d_params, s_cached.d_params)


def test_step_many_cached_rebuilds_for_new_cache(tiny_data, make_tiny_cfg):
    """The cached streaming program bakes in its cache's assemble_fn
    (resample policy); a different cache instance must rebuild it, not
    silently reuse the stale closure."""
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    cfg = make_tiny_cfg("film", train_kw=dict(n_critic=1))
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    cache4 = DeviceCache(tiny_data, batch_size=8, num_patches=4, seed=0)
    cache6 = DeviceCache(tiny_data, batch_size=8, num_patches=6, seed=0)
    state = eng.init_state(0, next(iter(cache4.epoch(0))))
    state, m4 = eng.step_many_cached(state, cache4, 0)
    assert np.isfinite(float(m4["d_loss"]))
    # stale closure would assemble 4-patch batches here (wrong shapes/policy)
    state2 = eng.init_state(0, next(iter(cache6.epoch(0))))
    state2, m6 = eng.step_many_cached(state2, cache6, 0)
    assert np.isfinite(float(m6["d_loss"]))
    # both caches keep their OWN compiled program (no eviction or
    # stale-closure reuse)
    assert cache4 in eng._train_many_cached
    assert cache6 in eng._train_many_cached
    assert (eng._train_many_cached[cache4]
            is not eng._train_many_cached[cache6])


# ---------------------------------------------------------------------------
# ShardedDeviceCache: bank sharded over the mesh `data` axis


def test_sharded_cache_epoch_partition_and_locality(rng):
    """Each epoch visits every case exactly once, and every batch's
    column block s contains ONLY cases from data shard s (the gather is
    shard-local by construction)."""
    from gemm_gan_tpu.data.device_cache import ShardedDeviceCache
    from gemm_gan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    data = _data(rng, n=24)
    cache = ShardedDeviceCache(data, batch_size=8, mesh=mesh, seed=0)
    assert cache.n_shard == 6 and cache.b_shard == 2 and len(cache) == 3
    for a in cache.arrays.values():
        assert a.sharding.spec[0] == "data", a.sharding

    row_to_case = {data["genes"][i].tobytes(): i for i in range(24)}
    seen = []
    for b in cache.epoch(0):
        g = np.asarray(b["genes"])
        for s in range(4):
            for row in g[s * 2:(s + 1) * 2]:
                case = row_to_case[row.tobytes()]
                assert s * 6 <= case < (s + 1) * 6, (case, s)
                seen.append(case)
    assert sorted(seen) == list(range(24))

    # deterministic per epoch, fresh across epochs
    b0 = [np.asarray(b["genes"]) for b in cache.epoch(0)]
    b0b = [np.asarray(b["genes"]) for b in cache.epoch(0)]
    b1 = [np.asarray(b["genes"]) for b in cache.epoch(1)]
    np.testing.assert_array_equal(np.stack(b0), np.stack(b0b))
    assert not np.array_equal(np.stack(b0), np.stack(b1))


def test_sharded_cache_trims_to_equal_shards(rng):
    from gemm_gan_tpu.data.device_cache import ShardedDeviceCache
    from gemm_gan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    cache = ShardedDeviceCache(_data(rng, n=26), batch_size=4, mesh=mesh,
                               seed=0)
    assert cache.n == 24 and cache.n_shard == 6  # 26 -> 24 (drop remainder)


def test_sharded_cache_scan_matches_per_batch_steps(tiny_data, make_tiny_cfg):
    """`step_many_cached` over a ShardedDeviceCache (one scanned device
    program per epoch, shard-local gathers in the scan body) must equal
    stepping the same epoch's batches through `engine.step` one by one —
    the iterator and the scan share the cache's gather program."""
    from gemm_gan_tpu.data.device_cache import ShardedDeviceCache
    from gemm_gan_tpu.parallel.mesh import make_mesh
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    cfg = make_tiny_cfg("film", train_kw=dict(n_critic=2))
    cache = ShardedDeviceCache(tiny_data, batch_size=8, mesh=mesh,
                               num_patches=4, seed=0)

    eng1 = WGANGPEngine(cfg, steps_per_epoch=len(cache), mesh=mesh)
    state1 = eng1.init_state(0, next(iter(cache.epoch(0))))
    state1, m1 = eng1.step_many_cached(state1, cache, 0)

    eng2 = WGANGPEngine(cfg, steps_per_epoch=len(cache), mesh=mesh)
    state2 = eng2.init_state(0, next(iter(cache.epoch(0))))
    m2 = None
    for b in cache.epoch(0):
        state2, m2 = eng2.step(state2, b)

    # The two paths consume BITWISE-identical batches (the iterator and the
    # scan share the cache's gather program; verified by construction), but
    # XLA compiles the scan-fused epoch program and the single-step program
    # with different fusion/reduction orders, so params drift at fp-noise
    # scale over the epoch — same cross-program tolerance as
    # tests/test_grad_accum.py.
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        (jax.device_get(state1.g_params), jax.device_get(state1.d_params)),
        (jax.device_get(state2.g_params), jax.device_get(state2.d_params)))


def test_sharded_cache_requires_matching_mesh(tiny_data, make_tiny_cfg):
    from gemm_gan_tpu.data.device_cache import ShardedDeviceCache
    from gemm_gan_tpu.parallel.mesh import make_mesh
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    other = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    cache = ShardedDeviceCache({"genes": tiny_data["genes"]}, batch_size=8,
                               mesh=mesh, seed=0)
    eng = WGANGPEngine(make_tiny_cfg("vanilla"), steps_per_epoch=2, mesh=other)
    state = eng.init_state(0, {"genes": tiny_data["genes"][:8]})
    with pytest.raises(ValueError, match="share one mesh"):
        eng.step_many_cached(state, cache, 0)
