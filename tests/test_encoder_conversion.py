"""Turnkey real-weight encoder conversion (VERDICT r2 missing #2).

The real UNI / Clinical ModernBERT checkpoints need network access this
environment lacks, so these tests pin the conversion CONTRACT instead: the
exact published dims (UNI = ViT-L/16 + LayerScale, 303,350,784 params;
Clinical ModernBERT = ModernBERT-base, 149,014,272 params — reference usage
/root/reference/src/download_and_preprocess_data.py:321,
src/preprocessing/save_text_embeddings.py:30-33), the torch-side key names
the converters consume, HF-cache checkpoint discovery, and the msgpack
save/load roundtrip — so the first network-enabled run of
`python -m gemm_gan_tpu.cli.convert_encoders` works without debugging.

Synthetic state dicts are zeros at the REAL published shapes: np.zeros is
virtually allocated and the converters only transpose/validate, so full-dim
coverage is cheap.
"""

import json

import numpy as np
import pytest

from gemm_gan_tpu.cli.convert_encoders import (find_checkpoint,
                                               load_converted, main)
from gemm_gan_tpu.encoders.modernbert import (ModernBertParams,
                                              convert_modernbert_state_dict,
                                              expected_modernbert_layout,
                                              validate_modernbert_layout)
from gemm_gan_tpu.encoders.vit import (ViTParams, convert_timm_vit_state_dict,
                                       expected_vit_layout,
                                       validate_vit_layout)

UNI_PARAM_COUNT = 303_350_784       # ViT-L/16 + LayerScale, 224x224, qkv bias
MODERNBERT_PARAM_COUNT = 149_014_272  # ModernBERT-base (the published "149M")


def synth_timm_vit_sd(p: ViTParams) -> dict:
    """timm-layout state dict of zeros at the published shapes."""
    E, M, ps = p.hidden_size, int(p.hidden_size * p.mlp_ratio), p.patch_size
    sd = {
        "patch_embed.proj.weight": np.zeros((E, 3, ps, ps), np.float32),
        "patch_embed.proj.bias": np.zeros((E,), np.float32),
        "cls_token": np.zeros((1, 1, E), np.float32),
        "pos_embed": np.zeros((1, 1 + p.num_patches, E), np.float32),
        "norm.weight": np.zeros((E,), np.float32),
        "norm.bias": np.zeros((E,), np.float32),
    }
    for i in range(p.num_layers):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": np.zeros((E,), np.float32),
            f"{b}.norm1.bias": np.zeros((E,), np.float32),
            f"{b}.attn.qkv.weight": np.zeros((3 * E, E), np.float32),
            f"{b}.attn.qkv.bias": np.zeros((3 * E,), np.float32),
            f"{b}.attn.proj.weight": np.zeros((E, E), np.float32),
            f"{b}.attn.proj.bias": np.zeros((E,), np.float32),
            f"{b}.norm2.weight": np.zeros((E,), np.float32),
            f"{b}.norm2.bias": np.zeros((E,), np.float32),
            f"{b}.mlp.fc1.weight": np.zeros((M, E), np.float32),
            f"{b}.mlp.fc1.bias": np.zeros((M,), np.float32),
            f"{b}.mlp.fc2.weight": np.zeros((E, M), np.float32),
            f"{b}.mlp.fc2.bias": np.zeros((E,), np.float32),
            f"{b}.ls1.gamma": np.zeros((E,), np.float32),
            f"{b}.ls2.gamma": np.zeros((E,), np.float32),
        })
    return sd


def synth_modernbert_sd(p: ModernBertParams) -> dict:
    """HF ModernBertModel state dict of zeros at the published shapes."""
    E, I, V = p.hidden_size, p.intermediate_size, p.vocab_size
    sd = {
        "embeddings.tok_embeddings.weight": np.zeros((V, E), np.float32),
        "embeddings.norm.weight": np.zeros((E,), np.float32),
        "final_norm.weight": np.zeros((E,), np.float32),
    }
    for i in range(p.num_layers):
        b = f"layers.{i}"
        sd.update({
            f"{b}.attn.Wqkv.weight": np.zeros((3 * E, E), np.float32),
            f"{b}.attn.Wo.weight": np.zeros((E, E), np.float32),
            f"{b}.mlp_norm.weight": np.zeros((E,), np.float32),
            f"{b}.mlp.Wi.weight": np.zeros((2 * I, E), np.float32),
            f"{b}.mlp.Wo.weight": np.zeros((E, I), np.float32),
        })
        if i != 0:
            sd[f"{b}.attn_norm.weight"] = np.zeros((E,), np.float32)
    return sd


def test_uni_conversion_at_published_dims():
    p = ViTParams()  # the UNI architecture IS the default
    layout = expected_vit_layout(p)
    assert layout["pos_embed"] == (1, 197, 1024)       # 224/16 grid + CLS
    assert layout["block_23/attn/qkv/kernel"] == (1024, 3072)
    assert "block_0/ls1" in layout                     # LayerScale present
    params = convert_timm_vit_state_dict(synth_timm_vit_sd(p), p)
    assert validate_vit_layout(params, p) == UNI_PARAM_COUNT


def test_modernbert_conversion_at_published_dims():
    p = ModernBertParams()  # ModernBERT-base IS the default
    layout = expected_modernbert_layout(p)
    assert layout["tok_embeddings/embedding"] == (50368, 768)
    assert "layer_0/attn_norm/scale" not in layout     # layer 0: no pre-norm
    assert layout["layer_21/Wi/kernel"] == (768, 2304)
    params = convert_modernbert_state_dict(synth_modernbert_sd(p), p)
    assert validate_modernbert_layout(params, p) == MODERNBERT_PARAM_COUNT


def test_layout_validation_catches_drift():
    p = ViTParams(hidden_size=8, num_layers=2, num_heads=2, img_size=8,
                  patch_size=4)
    params = convert_timm_vit_state_dict(synth_timm_vit_sd(p), p)
    validate_vit_layout(params, p)
    bad = dict(params, cls_token=np.zeros((1, 1, 9), np.float32))
    with pytest.raises(ValueError, match="shape mismatch.*cls_token"):
        validate_vit_layout(bad, p)
    missing = {k: v for k, v in params.items() if k != "norm"}
    with pytest.raises(ValueError, match="missing leaf norm/scale"):
        validate_vit_layout(missing, p)
    extra = dict(params, rogue=np.zeros((3,), np.float32))
    with pytest.raises(ValueError, match="unexpected leaf rogue"):
        validate_vit_layout(extra, p)


def test_cli_end_to_end_from_hf_cache(tmp_path, monkeypatch):
    """Full turnkey path: HF-cache discovery -> convert -> manifest -> load.

    Small dims (the real checkpoints need network); the discovery, file
    formats, manifest, and roundtrip are exactly the real path.
    """
    from safetensors.numpy import save_file

    vp = ViTParams(hidden_size=8, num_layers=2, num_heads=2, img_size=8,
                   patch_size=4)
    mp = ModernBertParams(vocab_size=64, hidden_size=8, intermediate_size=12,
                          num_layers=3, num_heads=2)
    # fake HF cache: UNI as torch .bin (its hub layout), ModernBERT as
    # safetensors + config.json (its hub layout)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    uni_dir = tmp_path / "hf/hub/models--MahmoodLab--uni/snapshots/aa"
    mb_dir = (tmp_path /
              "hf/hub/models--Simonlee711--Clinical_ModernBERT/snapshots/bb")
    uni_dir.mkdir(parents=True)
    mb_dir.mkdir(parents=True)
    import torch

    torch.save({k: torch.from_numpy(v)
                for k, v in synth_timm_vit_sd(vp).items()},
               uni_dir / "pytorch_model.bin")
    save_file(synth_modernbert_sd(mp), str(mb_dir / "model.safetensors"))
    (mb_dir / "config.json").write_text(json.dumps({
        "vocab_size": 64, "hidden_size": 8, "intermediate_size": 12,
        "num_hidden_layers": 3, "num_attention_heads": 2,
        "global_attn_every_n_layers": 3, "local_attention": 128,
        "global_rope_theta": 160000.0, "local_rope_theta": 10000.0,
        "norm_eps": 1e-5}))

    assert find_checkpoint("MahmoodLab/uni") == str(
        uni_dir / "pytorch_model.bin")
    with pytest.raises(FileNotFoundError, match="huggingface-cli download"):
        find_checkpoint("No/Such_Model")

    out = tmp_path / "out"
    # the real UNI/ModernBERT converters pin published dims; drive the CLI's
    # modernbert path end-to-end (config.json carries the dims), and the
    # uni converter pieces directly at the small dims
    main(["--modernbert", "Simonlee711/Clinical_ModernBERT",
          "--out", str(out)])
    manifest = json.loads((out / "clinical_modernbert.msgpack.json").read_text())
    assert manifest["num_layers"] == 3 and manifest["param_count"] > 0
    restored = load_converted(str(out / "clinical_modernbert.msgpack"))
    assert validate_modernbert_layout(restored, mp) == manifest["param_count"]
