"""Shared flagship/tiny shape constants for the probe scripts.

One source of truth for the canonical GeMM-GAN shapes (BASELINE.md
"Canonical configuration") and the tiny smoke config, so a config change
cannot leave a probe silently measuring stale shapes.
"""

from __future__ import annotations

# canonical flagship: batch 8, 18,868 genes, 256x1024 UNI patches,
# 300x768 ModernBERT tokens (reference defaults, SURVEY.md §6)
FULL_DIMS = dict(n_genes=18868, n_patches=256, patch_dim=1024,
                 n_tokens=300, text_dim=768)
TINY_DIMS = dict(n_genes=64, n_patches=16, patch_dim=32,
                 n_tokens=8, text_dim=24)
TINY_FUSION_KW = dict(cond_dim=16, ff_dim=32, num_heads=2, num_layers=1,
                      n_disease_types=3, n_primary_sites=2, use_pallas=False)


def dims_and_fusion_kw(full: bool):
    """(dims dict, fusion_kw) for the flagship (full=True) or tiny config."""
    if full:
        import jax

        return FULL_DIMS, dict(use_pallas=jax.default_backend() != "cpu")
    kw = dict(TINY_FUSION_KW)
    kw.update(text_dim=TINY_DIMS["text_dim"], patch_dim=TINY_DIMS["patch_dim"])
    return TINY_DIMS, kw
