"""Offline encoders (L1): Flax ViT (UNI-style) and ModernBERT ports.

The reference encodes histopathology patches with the timm UNI ViT
(/root/reference/src/download_and_preprocess_data.py:321-323) and clinical
descriptions with `Simonlee711/Clinical_ModernBERT`
(/root/reference/src/preprocessing/save_text_embeddings.py:30-33) — both as
CUDA torch models behind thread locks. Here both are native Flax modules with
weight converters from the published torch checkpoints, jitted batch
inference, and an embedding-cache builder (see cache.py), so encoding is a
compiled TPU program feeding the HBM-resident training cache.
"""

from gemm_gan_tpu.encoders.modernbert import (FlaxModernBert, ModernBertParams,
                                              convert_modernbert_state_dict)
from gemm_gan_tpu.encoders.vit import (FlaxViT, ViTParams,
                                       convert_hf_vit_state_dict,
                                       convert_timm_vit_state_dict)

__all__ = [
    "FlaxViT", "ViTParams", "convert_timm_vit_state_dict",
    "convert_hf_vit_state_dict",
    "FlaxModernBert", "ModernBertParams", "convert_modernbert_state_dict",
]
