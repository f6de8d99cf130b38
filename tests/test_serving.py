"""Portable serving artifacts (`gemm_gan_tpu.serving`, `cli.export`).

Beyond-reference capability: the reference's checkpoints can only be
reloaded by re-importing the experiment file that defines the model
(/root/reference/src/conditional_gan_concat.py:869-877); these artifacts are
self-contained StableHLO + weights, loadable with no model code.
"""

import json
import os

import jax
import numpy as np
import pytest

from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.serving import GeneratorArtifact, cond_keys_for, export_generator
from gemm_gan_tpu.train.wgan import WGANGPEngine, cond_of


def _engine_state_batch(make_tiny_cfg, tiny_data, variant, schema_keys,
                        batch_size=4, **cfg_kw):
    cfg = make_tiny_cfg(variant, **cfg_kw)
    data = {k: tiny_data[k] for k in schema_keys}
    batch = next(iter(Batches(data, batch_size=batch_size, seed=0,
                              shuffle=False)))
    eng = WGANGPEngine(cfg, steps_per_epoch=1)
    state = eng.init_state(0, batch)
    return eng, state, batch


def test_roundtrip_matches_generator_flagship(tmp_path, tiny_data,
                                              make_tiny_cfg):
    """Export -> save -> load -> call equals the live generator forward,
    with a dynamic batch dimension (exported at B=4, served at B=7)."""
    eng, state, batch = _engine_state_batch(
        make_tiny_cfg, tiny_data, "film_cross_attention",
        ("genes", "tokens", "token_mask", "patches", "patch_mask"))
    art = export_generator(eng, state, batch, platforms=("cpu",))
    path = art.save(str(tmp_path / "art"))
    loaded = GeneratorArtifact.load(path)

    params = jax.device_get(state.g_params)
    for n in (4, 7):
        sub = {k: np.repeat(np.asarray(batch[k])[:1], n, axis=0)
               for k in batch}
        z = np.random.RandomState(n).randn(
            n, eng.cfg.model.latent_dim).astype(np.float32)
        got = np.asarray(loaded(z, cond_of(sub)))
        want = np.asarray(eng.gen.apply({"params": params}, z, cond_of(sub),
                                        deterministic=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # the sequence dims are symbolic too: double the patch count (padding
    # half of it away must equal the unpadded forward)
    sub = {k: np.asarray(batch[k]) for k in batch}
    pad = {**sub,
           "patches": np.concatenate(
               [sub["patches"], np.zeros_like(sub["patches"])], axis=1),
           "patch_mask": np.concatenate(
               [sub["patch_mask"], np.zeros_like(sub["patch_mask"])], axis=1)}
    z = np.random.RandomState(9).randn(
        4, eng.cfg.model.latent_dim).astype(np.float32)
    np.testing.assert_allclose(np.asarray(loaded(z, cond_of(pad))),
                               np.asarray(loaded(z, cond_of(sub))),
                               rtol=1e-5, atol=1e-5)

    assert loaded.manifest["batch"] == "dynamic"
    assert [s["key"] for s in loaded.manifest["cond_spec"]] == [
        "tokens", "token_mask", "patches", "patch_mask"]


def test_unconditional_and_labels_variants(tmp_path, tiny_data, make_tiny_cfg):
    # unconditional: sample() needs an explicit n
    eng, state, batch = _engine_state_batch(
        make_tiny_cfg, tiny_data, "vanilla", ("genes",))
    art = export_generator(eng, state, batch, platforms=("cpu",))
    loaded = GeneratorArtifact.load(art.save(str(tmp_path / "v")))
    with pytest.raises(ValueError, match="pass n"):
        loaded.sample(jax.random.key(0))
    out = loaded.sample(jax.random.key(0), n=5)
    assert out.shape == (5, eng.cfg.model.n_genes)

    # label-conditional: integer inputs ride the signature
    eng, state, batch = _engine_state_batch(
        make_tiny_cfg, tiny_data, "benchmark", ("genes", "disease", "site"))
    art = export_generator(eng, state, batch, platforms=("cpu",))
    loaded = GeneratorArtifact.load(art.save(str(tmp_path / "l")))
    out = loaded.sample(jax.random.key(1), cond=cond_of(batch))
    assert out.shape == (4, eng.cfg.model.n_genes)
    z = np.zeros((4, eng.cfg.model.latent_dim), np.float32)
    want = np.asarray(eng.gen.apply(
        {"params": jax.device_get(state.g_params)}, z, cond_of(batch),
        deterministic=True))
    np.testing.assert_allclose(np.asarray(loaded(z, cond_of(batch))), want,
                               rtol=1e-5, atol=1e-5)


def test_static_batch_and_errors(tmp_path, tiny_data, make_tiny_cfg):
    eng, state, batch = _engine_state_batch(
        make_tiny_cfg, tiny_data, "concat_text", ("genes", "text_emb"))
    art = export_generator(eng, state, batch, platforms=("cpu",),
                           batch_size=4)
    loaded = GeneratorArtifact.load(art.save(str(tmp_path / "s")))
    assert loaded.manifest["batch"] == 4
    z = np.zeros((4, eng.cfg.model.latent_dim), np.float32)
    assert np.asarray(loaded(z, cond_of(batch))).shape == (4, 24)
    # wrong batch is a shape error from the exported signature
    with pytest.raises(Exception):
        loaded(np.zeros((3, eng.cfg.model.latent_dim), np.float32),
               {"text_emb": np.asarray(batch["text_emb"])[:3]})
    # missing conditioning
    with pytest.raises(ValueError, match="requires conditioning"):
        loaded(z, None)
    with pytest.raises(ValueError, match="missing key"):
        loaded(z, {"patches": np.zeros((4, 8, 16), np.float32)})


def test_cond_keys_for_every_kind(make_tiny_cfg):
    expect = {
        "vanilla": (),
        "concat_text": ("text_emb",),
        "concat_image": ("patches", "patch_mask"),
        "attention": ("text_emb", "patches", "patch_mask"),
        "img_transformer": ("patches", "patch_mask"),
        "film": ("text_emb", "patches", "patch_mask"),
        "cross_attention": ("tokens", "token_mask", "patches", "patch_mask"),
        "film_cross_attention": ("tokens", "token_mask", "patches",
                                 "patch_mask"),
        "benchmark": ("disease", "site"),
    }
    for variant, keys in expect.items():
        cfg = make_tiny_cfg(variant)
        assert cond_keys_for(cfg.model.fusion) == keys, variant


def test_export_cli_end_to_end(tmp_path, tiny_data, make_tiny_cfg):
    """cli.export turns a self-describing run dir into a loadable artifact
    that reproduces the checkpointed generator."""
    from gemm_gan_tpu.cli.export import main as export_main
    from gemm_gan_tpu.config import save_config
    from gemm_gan_tpu.train.checkpoint import save_state

    eng, state, batch = _engine_state_batch(
        make_tiny_cfg, tiny_data, "film_cross_attention",
        ("genes", "tokens", "token_mask", "patches", "patch_mask"))
    state, _ = eng.step(state, batch)  # a trained-ish state
    run_dir = tmp_path / "run"
    ckpt = str(run_dir / "ckpt")
    os.makedirs(run_dir, exist_ok=True)
    save_config(eng.cfg, str(run_dir / "config.json"))
    save_state(ckpt, jax.device_get(state))

    out = str(tmp_path / "artifact")
    export_main(["--ckpt_dir", ckpt, "--out", out, "--platforms", "cpu"])

    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["variant"] == "film_cross_attention"
    loaded = GeneratorArtifact.load(out)
    z = np.random.RandomState(0).randn(
        4, eng.cfg.model.latent_dim).astype(np.float32)
    want = np.asarray(eng.gen.apply(
        {"params": jax.device_get(state.g_params)}, z, cond_of(batch),
        deterministic=True))
    np.testing.assert_allclose(np.asarray(loaded(z, cond_of(batch))), want,
                               rtol=1e-5, atol=1e-5)


def test_vae_and_cvae_decoder_export(tmp_path, tiny_data, make_tiny_cfg):
    """export_vae_decoder reproduces the engines' decode-from-prior sampling
    given the same z, for both the unconditional and label-conditional VAE."""
    from gemm_gan_tpu.serving import export_vae_decoder
    from gemm_gan_tpu.train.vae import VAEEngine

    # VAE
    cfg = make_tiny_cfg("vae")
    batch = next(iter(Batches({"genes": tiny_data["genes"]}, batch_size=4,
                              seed=0, shuffle=False)))
    eng = VAEEngine(cfg)
    state = eng.init_state(0, batch)
    art = export_vae_decoder(eng, state, batch, platforms=("cpu",))
    loaded = GeneratorArtifact.load(art.save(str(tmp_path / "vae")))
    z = np.random.RandomState(0).randn(
        6, cfg.model.vae_latent_dim).astype(np.float32)
    want = np.asarray(eng.model.apply(
        {"params": jax.device_get(state.params)}, z, method="decode"))
    np.testing.assert_allclose(np.asarray(loaded(z)), want,
                               rtol=1e-5, atol=1e-5)

    # CVAE: labels ride the signature
    cfg = make_tiny_cfg("cvae")
    data = {k: tiny_data[k] for k in ("genes", "disease", "site")}
    batch = next(iter(Batches(data, batch_size=4, seed=0, shuffle=False)))
    eng = VAEEngine(cfg)
    state = eng.init_state(0, batch)
    art = export_vae_decoder(eng, state, batch, platforms=("cpu",))
    loaded = GeneratorArtifact.load(art.save(str(tmp_path / "cvae")))
    assert [s["key"] for s in loaded.manifest["cond_spec"]] == [
        "disease", "site"]
    cond = {"disease": np.asarray(batch["disease"]),
            "site": np.asarray(batch["site"])}
    z = np.random.RandomState(1).randn(
        4, cfg.model.vae_latent_dim).astype(np.float32)
    want = np.asarray(eng.model.apply(
        {"params": jax.device_get(state.params)}, z, cond["disease"],
        cond["site"], method="decode"))
    np.testing.assert_allclose(np.asarray(loaded(z, cond)), want,
                               rtol=1e-5, atol=1e-5)
    assert loaded.sample(jax.random.key(0), cond=cond).shape == (4, 24)


def test_export_cli_vae_variant(tmp_path, tiny_data, make_tiny_cfg):
    from gemm_gan_tpu.cli.export import main as export_main
    from gemm_gan_tpu.config import save_config
    from gemm_gan_tpu.train.checkpoint import save_state
    from gemm_gan_tpu.train.vae import VAEEngine

    cfg = make_tiny_cfg("cvae")
    data = {k: tiny_data[k] for k in ("genes", "disease", "site")}
    batch = next(iter(Batches(data, batch_size=4, seed=0, shuffle=False)))
    eng = VAEEngine(cfg)
    state = eng.init_state(0, batch)
    run_dir = tmp_path / "run"
    os.makedirs(run_dir, exist_ok=True)
    save_config(cfg, str(run_dir / "config.json"))
    ckpt = str(run_dir / "ckpt")
    save_state(ckpt, jax.device_get(state))

    out = str(tmp_path / "artifact")
    export_main(["--ckpt_dir", ckpt, "--out", out, "--platforms", "cpu"])
    loaded = GeneratorArtifact.load(out)
    assert loaded.manifest["variant"] == "cvae"
    assert loaded.manifest["latent_dim"] == cfg.model.vae_latent_dim


def test_export_cli_rejects_pallas_multiplatform(tmp_path):
    from gemm_gan_tpu.cli.export import main as export_main

    with pytest.raises(SystemExit, match="Mosaic"):
        export_main(["--ckpt_dir", str(tmp_path / "x"), "--out",
                     str(tmp_path / "y"), "--platforms", "tpu,cpu",
                     "--use_pallas", "on"])
