"""Honest subsystem throughput probes (single chip).

Re-measures the subsystem numbers in BASELINE.md with forced host
materialization per timed call (`float(jax.device_get(...))`): on the axon
tunnel `jax.block_until_ready` returns before remote execution finishes, so
block-based timings measure enqueue rate, not the chip (see bench.py).

    python -u scripts/probe_subsystems.py [sampling perstep flash vit gamma]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax

    return float(np.asarray(jax.device_get(x)).ravel()[0])


def _timed(fn, n_calls=4):
    """Best sustained seconds/call after a discarded warm call."""
    fn()  # warm (compile already done by caller)
    times = []
    for _ in range(n_calls):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def probe_sampling(batch_size=64):
    """Generator forward (full fusion conditioning), profiles/sec."""
    import jax

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    cfg = variant_config("film_cross_attention", n_genes=18868)
    eng = WGANGPEngine(cfg, steps_per_epoch=100)
    rng = np.random.RandomState(0)
    batch = {
        "genes": rng.randn(batch_size, 18868).astype(np.float32),
        "tokens": rng.randn(batch_size, 300, 768).astype(np.float32),
        "token_mask": np.ones((batch_size, 300), dtype=bool),
        "patches": rng.randn(batch_size, 256, 1024).astype(np.float32),
        "patch_mask": np.ones((batch_size, 256), dtype=bool),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    state = eng.init_state(0, batch)
    key = jax.random.key(0)

    def call():
        out = eng.generate_samples(state, key, batch)
        _sync(out[0, :1])

    call()  # compile
    sec = _timed(call)
    return {"metric": "sampled_profiles_per_sec", "batch": batch_size,
            "value": round(batch_size / sec, 1)}


def probe_perstep(n_steps=10, reuse=True):
    """Per-step dispatch path (no scan), canonical config, steps/sec."""
    import dataclasses

    import jax

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    cfg = variant_config("film_cross_attention", n_genes=18868)
    if reuse:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, cond_embed_reuse="per_update"))
    eng = WGANGPEngine(cfg, steps_per_epoch=100)
    rng = np.random.RandomState(0)
    batch = {
        "genes": rng.randn(8, 18868).astype(np.float32),
        "tokens": rng.randn(8, 300, 768).astype(np.float32),
        "token_mask": np.ones((8, 300), dtype=bool),
        "patches": rng.randn(8, 256, 1024).astype(np.float32),
        "patch_mask": np.ones((8, 256), dtype=bool),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    state = eng.init_state(0, batch)
    state, m = eng.step(state, batch)  # compile
    _sync(m["d_loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = eng.step(state, batch)
        _sync(m["d_loss"])
    sec = (time.perf_counter() - t0) / n_steps
    return {"metric": "wgan_gp_per_step_dispatch_steps_per_sec",
            "reuse": reuse, "value": round(1.0 / sec, 2)}


def probe_flash(L=4096, B=8, H=4, D=64):
    """Pallas flash kernel vs XLA-compiled jnp reference, fwd+bwd, ms."""
    import jax
    import jax.numpy as jnp

    from gemm_gan_tpu.kernels import flash_attention as fa

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, D).astype(np.float32))
    mask = jnp.asarray(np.ones((B, L), dtype=bool))

    out = {}
    for name, f in (("flash", fa.flash_mha), ("xla_ref", fa.mha_reference)):
        loss = jax.jit(jax.value_and_grad(
            lambda q, k, v, f=f: jnp.sum(f(q, k, v, mask) ** 2),
            argnums=(0, 1, 2)))

        def call():
            val, grads = loss(q, k, v)
            _sync(val)

        try:
            call()  # compile
            out[name + "_ms"] = round(_timed(call) * 1e3, 2)
        except Exception as e:
            out[name + "_error"] = repr(e)[:120]
    if "flash_ms" in out and "xla_ref_ms" in out:
        out["speedup"] = round(out["xla_ref_ms"] / out["flash_ms"], 2)
    return {"metric": "flash_vs_xla_fwd_bwd", "L": L, **out}


def probe_vit(batch_size=64, n_calls=4):
    """UNI ViT-L/16 jitted batch inference, imgs/sec, f32 vs bf16 compute
    (params f32 either way; layernorms/softmax pinned f32 in the module)."""
    import jax
    import jax.numpy as jnp

    from gemm_gan_tpu.encoders.vit import FlaxViT

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(batch_size, 224, 224, 3).astype(np.float32))
    out = {"metric": "vit_l16_imgs_per_sec", "batch": batch_size}
    params = FlaxViT().init({"params": jax.random.key(0)}, imgs[:1])
    for label, dtype in (("value", jnp.float32), ("value_bf16", jnp.bfloat16)):
        model = FlaxViT(dtype=dtype)
        fwd = jax.jit(lambda p, x, m=model: m.apply(p, x))

        def call():
            _sync(fwd(params, imgs)[0, :1])

        call()
        sec = _timed(call, n_calls)
        out[label] = round(batch_size / sec, 1)
    # embedding fidelity of the bf16 path vs f32 on the same inputs
    e32 = np.asarray(jax.jit(lambda p, x: FlaxViT().apply(p, x))(params, imgs))
    e16 = np.asarray(jax.jit(
        lambda p, x: FlaxViT(dtype=jnp.bfloat16).apply(p, x))(params, imgs))
    cos = np.sum(e32 * e16, 1) / (np.linalg.norm(e32, axis=1)
                                  * np.linalg.norm(e16, axis=1) + 1e-12)
    out["bf16_min_cosine_vs_f32"] = round(float(cos.min()), 6)
    return out


def probe_gamma(n=512, genes=18868):
    """Γ score device path, seconds for (n x genes) real/fake pair."""
    from gemm_gan_tpu.eval.gamma import gamma_coef

    rng = np.random.RandomState(0)
    a = rng.randn(n, genes).astype(np.float32)
    b = rng.randn(n, genes).astype(np.float32)
    float(gamma_coef(a, b))  # compile + warm
    t0 = time.perf_counter()
    val = float(gamma_coef(a, b))
    sec = time.perf_counter() - t0
    return {"metric": "gamma_full_genes_seconds", "n": n, "genes": genes,
            "seconds": round(sec, 3), "value_sample": round(val, 4)}


def probe_sampling_scan(batch_size=64, n_batches=16, num_repeats=2,
                        num_patches=256):
    """Serving throughput over a whole loader, per-call vs scan=True
    (generate_samples_all): same K batches x R repeats, fakes fetched to
    host either way. The scan path runs one lax.map device program with the
    condition embedding shared across repeats. `serving_ws` runs the same
    probe conditioned on whole-slide 4,096-patch inputs (smaller batches:
    the conditioning alone is 134 MB/batch on device)."""
    import jax

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    cfg = variant_config("film_cross_attention", n_genes=18868)
    eng = WGANGPEngine(cfg, steps_per_epoch=100)
    rng = np.random.RandomState(0)
    batches = []
    for _ in range(n_batches):
        b = {
            "genes": rng.randn(batch_size, 18868).astype(np.float32),
            "tokens": rng.randn(batch_size, 300, 768).astype(np.float32),
            "token_mask": np.ones((batch_size, 300), dtype=bool),
            "patches": rng.randn(batch_size, num_patches,
                                 1024).astype(np.float32),
            "patch_mask": np.ones((batch_size, num_patches), dtype=bool),
        }
        batches.append({k: jax.device_put(v) for k, v in b.items()})
    state = eng.init_state(0, batches[0])
    key = jax.random.key(0)
    n_profiles = batch_size * n_batches * num_repeats

    out = {"metric": "serving_profiles_per_sec", "batch": batch_size,
           "n_batches": n_batches, "num_repeats": num_repeats,
           "num_patches": num_patches}
    # host-delivery path: full fakes fetched to numpy (transfer-bound over
    # the tunnel — both paths pay the same ~150 MB device->host)
    for label, scan, host_dtype in (
            ("per_call_fetch", False, None), ("scan_fetch", True, None),
            ("scan_fetch_f16", True, np.float16)):
        def call():
            res = eng.generate_samples_all(state, key, batches,
                                           num_repeats=num_repeats, scan=scan,
                                           host_dtype=host_dtype)
            assert res["fake"].shape[0] == n_profiles
        call()  # compile + warm
        sec = _timed(call, n_calls=3)
        out[label] = round(n_profiles / sec, 1)

    # compute path: execution forced by a scalar sync, fakes stay on device
    # (what an on-device consumer — eval metrics, a downstream model — sees)
    def per_call_sync():
        outs = []
        for r in range(num_repeats):
            for k_idx, b in enumerate(batches):
                sub = jax.random.fold_in(jax.random.fold_in(key, k_idx), r)
                outs.append(eng.generate_samples(state, sub, b))
        for o in outs:
            _sync(o[0, :1])

    per_call_sync()
    out["per_call_compute"] = round(n_profiles / _timed(per_call_sync, 3), 1)

    import jax.numpy as jnp

    from gemm_gan_tpu.train.wgan import COND_KEYS

    if eng._sample_scan is None:
        eng._sample_scan = eng._build_sample_scan()
    cond_scan, _ = eng._sample_scan
    stacked = {k: jnp.stack([b[k] for b in batches])
               for k in COND_KEYS if k in batches[0]}

    def scan_sync():
        o = cond_scan(state.g_params, key, stacked,
                      num_repeats=num_repeats, batch=batch_size)
        _sync(o[0, 0, 0, :1])

    scan_sync()
    out["scan_compute"] = round(n_profiles / _timed(scan_sync, 3), 1)
    return out


def probe_validation(n=512, genes=18868, batch=64):
    """Periodic-validation pass, host protocol vs on-device proxy, seconds.

    Host mode = the reference protocol (fetch full real/fake matrices, run
    the LR/MLP/RF detection suite + compute_evaluation_metrics raw+PCA).
    Proxy mode = eval.on_device_validation (device_out generation, kNN
    detection + PRDC from device arrays — only scalars leave the chip).
    Same generator, same untrained state, same conditioning cache.
    """
    import time as _time

    import jax

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.device_cache import DeviceCache
    from gemm_gan_tpu.eval.detection import (compute_evaluation_metrics,
                                             detection, knn_detection)
    from gemm_gan_tpu.eval.prdc import compute_prdc
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    rng = np.random.RandomState(0)
    data = {
        "genes": rng.randn(n, genes).astype(np.float32),
        "tokens": rng.randn(n, 300, 768).astype(np.float32),
        "token_mask": np.ones((n, 300), dtype=bool),
        "patches": rng.randn(n, 256, 1024).astype(np.float32),
        "patch_mask": np.ones((n, 256), dtype=bool),
    }
    cache = DeviceCache(data, batch_size=batch, seed=0, shuffle=False,
                        drop_remainder=False)
    cfg = variant_config("film_cross_attention", n_genes=genes)
    eng = WGANGPEngine(cfg, steps_per_epoch=1)
    state = eng.init_state(0, next(iter(cache.epoch(0))))
    key = jax.random.key(0)
    h = n // 2
    out = {"metric": "validation_eval_seconds", "n": n, "genes": genes}

    def host_mode():
        o = eng.generate_samples_all(state, key, cache.epoch(0))
        real, fake = o["real"], o["fake"]
        det = detection(real[:h], fake[:h], real[h:], fake[h:])
        met = compute_evaluation_metrics(real[:h], fake[:h], real[h:],
                                         fake[h:], nn=10,
                                         n_components=min(100, h - 1))
        return det, met

    def proxy_mode():
        o = eng.generate_samples_all(state, key, cache.epoch(0),
                                     device_out=True)
        real, fake = o["real"], o["fake"]
        det = knn_detection(real[:h], fake[:h], real[h:], fake[h:])
        met = compute_prdc(real[:h], fake[:h], nearest_k=10)
        return det, met

    for label, fn in (("proxy", proxy_mode), ("host", host_mode)):
        fn()  # compile + warm
        t0 = _time.perf_counter()
        fn()
        out[label + "_s"] = round(_time.perf_counter() - t0, 2)
    return out


PROBES = {"sampling": probe_sampling, "perstep": probe_perstep,
          "flash": probe_flash, "vit": probe_vit, "gamma": probe_gamma,
          "serving": probe_sampling_scan, "validation": probe_validation,
          "serving_ws": lambda: probe_sampling_scan(
              batch_size=8, n_batches=8, num_repeats=2, num_patches=4096)}


def main():
    names = [a for a in sys.argv[1:] if a in PROBES] or list(PROBES)
    for name in names:
        try:
            print(json.dumps(PROBES[name]()), flush=True)
        except Exception as e:
            print(json.dumps({"metric": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
