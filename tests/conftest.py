"""Test config: force CPU with a virtual 8-device mesh BEFORE jax imports.

This substitutes for the absent distributed-test story in the reference
(SURVEY.md §4): DP/TP sharding paths are exercised on fake devices.
"""

import os

# Force, don't setdefault: the TPU runtime environment pins JAX_PLATFORMS to
# its own backend and a sitecustomize hook registers it at interpreter start;
# tests must run on the virtual 8-CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
# Virtual 8-device mesh + the suite's LLVM backend opt level. The cold
# suite's wall-clock is dominated by single-threaded XLA:CPU compiles of
# many DISTINCT fused-step programs (CLAUDE.md: 29m02 -> 19m21 cold on
# 1 vCPU from -O0 alone: compile+first-call ~40% faster, execution of the
# ~ms-scale test programs ~1.7x slower — net win for the default suite;
# the execution-heavy `-m slow` statistical gates pay more execution, a
# documented trade on the non-default path). Not fast-math: float
# semantics are unchanged. ONE policy shared with the multihost subprocess
# workers (tests/_xla_test_flags.py) — they must compile at the SAME level
# as the in-suite runs they are compared against bitwise. Override with
# GEMM_GAN_TEST_XLA_OPT=<level> / -1, or pin the flag in XLA_FLAGS.
from _xla_test_flags import build_xla_flags  # noqa: E402

os.environ["XLA_FLAGS"] = build_xla_flags(8)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's wall-clock is dominated by
# compiles of the fused WGAN-GP step (VERDICT r1 weak #6); with the cache
# warm, re-runs skip them entirely. Shared with the multihost workers,
# __graft_entry__'s dry-run child, and bench.py via the same helper.
from gemm_gan_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def tiny_data():
    from gemm_gan_tpu.data.synthetic import synthetic_dataset

    return synthetic_dataset(n=48, n_genes=24, n_classes=3, n_sites=2,
                             num_patches=8, patch_dim=16, num_tokens=6,
                             text_dim=12, seed=1)


def tiny_cfg(variant, **overrides):
    import dataclasses

    from gemm_gan_tpu.config import variant_config

    fusion_kw = dict(cond_dim=16, text_dim=12, patch_dim=16, ff_dim=32,
                     num_heads=2, num_layers=1, n_disease_types=3,
                     n_primary_sites=2, use_pallas=False)
    fusion_kw.update(overrides.pop("fusion_kw", {}))
    # n_critic=2 + critic_scan: the fused step's compile cost dominates the
    # suite (VERDICT r2 weak #5); scan-vs-unrolled numerics equivalence is
    # pinned by test_engine.py::test_critic_scan_matches_unrolled, which
    # builds both explicitly, so everything else compiles the small program.
    train_kw = dict(n_critic=2, critic_scan=True)
    train_kw.update(overrides.pop("train_kw", {}))
    cfg = variant_config(variant, n_genes=24, fusion_kw=fusion_kw, **overrides)
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, gen_dims=(32, 32), disc_dims=(32, 32),
                                  latent_dim=16, vae_latent_dim=8,
                                  vae_encoder_dims=(32,), vae_decoder_dims=(32,)),
        train=dataclasses.replace(cfg.train, **train_kw),
    )


@pytest.fixture(scope="session")
def make_tiny_cfg():
    return tiny_cfg
