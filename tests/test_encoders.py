"""Encoder parity: Flax ViT / ModernBERT vs the torch reference models on
random tiny configs (weight conversion + forward semantics)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def test_vit_matches_hf_vit():
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig, ViTModel

    from gemm_gan_tpu.encoders.vit import (FlaxViT, ViTParams,
                                           convert_hf_vit_state_dict)

    cfg = ViTConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                    intermediate_size=64, image_size=32, patch_size=8,
                    layer_norm_eps=1e-6)
    torch.manual_seed(0)
    model = ViTModel(cfg, add_pooling_layer=False).eval()
    p = ViTParams(img_size=32, patch_size=8, hidden_size=32, num_layers=2,
                  num_heads=4, mlp_ratio=2.0, layerscale_init=None,
                  norm_eps=1e-6)
    params = convert_hf_vit_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, p)

    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(imgs).permute(0, 3, 1, 2)
                     ).last_hidden_state.numpy()
    got = FlaxViT(p, pool="none").apply({"params": params}, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_vit_timm_layout_roundtrip():
    """Build a timm-style state dict (random) and check conversion shapes +
    a finite forward incl. LayerScale params."""
    from gemm_gan_tpu.encoders.vit import (FlaxViT, ViTParams,
                                           convert_timm_vit_state_dict)

    p = ViTParams(img_size=32, patch_size=8, hidden_size=32, num_layers=2,
                  num_heads=4, mlp_ratio=2.0, layerscale_init=1e-5)
    rng = np.random.RandomState(0)
    E, FF = 32, 64
    sd = {
        "patch_embed.proj.weight": rng.randn(E, 3, 8, 8) * 0.02,
        "patch_embed.proj.bias": rng.randn(E) * 0.02,
        "cls_token": rng.randn(1, 1, E) * 0.02,
        "pos_embed": rng.randn(1, 1 + p.num_patches, E) * 0.02,
        "norm.weight": np.ones(E), "norm.bias": np.zeros(E),
    }
    for i in range(2):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": np.ones(E), f"{b}.norm1.bias": np.zeros(E),
            f"{b}.attn.qkv.weight": rng.randn(3 * E, E) * 0.02,
            f"{b}.attn.qkv.bias": rng.randn(3 * E) * 0.02,
            f"{b}.attn.proj.weight": rng.randn(E, E) * 0.02,
            f"{b}.attn.proj.bias": rng.randn(E) * 0.02,
            f"{b}.ls1.gamma": np.full(E, 1e-5),
            f"{b}.norm2.weight": np.ones(E), f"{b}.norm2.bias": np.zeros(E),
            f"{b}.mlp.fc1.weight": rng.randn(FF, E) * 0.02,
            f"{b}.mlp.fc1.bias": rng.randn(FF) * 0.02,
            f"{b}.mlp.fc2.weight": rng.randn(E, FF) * 0.02,
            f"{b}.mlp.fc2.bias": rng.randn(E) * 0.02,
            f"{b}.ls2.gamma": np.full(E, 1e-5),
        })
    params = convert_timm_vit_state_dict(sd, p)
    out = FlaxViT(p).apply({"params": params},
                           jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32))
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("seq_len", [16, 48])
def test_modernbert_matches_hf(seq_len):
    torch = pytest.importorskip("torch")
    from transformers import ModernBertConfig, ModernBertModel

    from gemm_gan_tpu.encoders.modernbert import (FlaxModernBert,
                                                  convert_modernbert_state_dict,
                                                  params_from_config)

    cfg = ModernBertConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4,
        global_attn_every_n_layers=2, local_attention=8, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, cls_token_id=3, sep_token_id=4,
        attn_implementation="eager", reference_compile=False)
    torch.manual_seed(0)
    model = ModernBertModel(cfg).eval()
    p = params_from_config(cfg)
    params = convert_modernbert_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, p)

    rng = np.random.RandomState(2)
    ids = rng.randint(0, 128, size=(2, seq_len))
    lens = np.array([seq_len, max(2, seq_len // 2)])
    mask = (np.arange(seq_len)[None, :] < lens[:, None])
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask.astype(np.int64))
                     ).last_hidden_state.numpy()
    got = np.asarray(FlaxModernBert(p).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask)))
    # compare only valid positions (HF unpads/repads; padded rows are garbage)
    np.testing.assert_allclose(got[mask], want[mask], rtol=2e-4, atol=2e-5)


def test_modernbert_cls_is_first_token():
    from gemm_gan_tpu.encoders.modernbert import FlaxModernBert, ModernBertParams

    p = ModernBertParams(vocab_size=64, hidden_size=16, intermediate_size=24,
                         num_layers=2, num_heads=2, global_every=2,
                         local_window=4)
    import jax

    m = FlaxModernBert(p)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 8)))
    params = m.init(jax.random.key(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_dynamic_image_size_interpolates_pos_embed():
    import jax

    from gemm_gan_tpu.encoders.vit import FlaxViT, ViTParams

    p = ViTParams(img_size=32, patch_size=8, hidden_size=16, num_layers=1,
                  num_heads=2, mlp_ratio=2.0, layerscale_init=None)
    m = FlaxViT(p)
    params = m.init(jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32))
    out224 = m.apply(params, np.zeros((2, 32, 32, 3), np.float32))
    out_dyn = m.apply(params, np.zeros((2, 48, 48, 3), np.float32))
    assert out224.shape == out_dyn.shape == (2, 16)
    assert np.isfinite(np.asarray(out_dyn)).all()


def test_encoders_bf16_compute_close_to_f32():
    """bf16 compute dtype (ingest/preprocess --encoder_dtype) must track the
    f32 embeddings closely — inference-only precision for the offline
    embedding caches (layernorms/softmax stay f32 in both modules)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemm_gan_tpu.encoders.modernbert import FlaxModernBert, ModernBertParams
    from gemm_gan_tpu.encoders.vit import FlaxViT, ViTParams

    def cos(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        num = (a * b).sum(-1)
        return num / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
                      + 1e-12)

    p = ViTParams(img_size=32, patch_size=8, hidden_size=32, num_layers=2,
                  num_heads=2)
    imgs = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3),
                       jnp.float32)
    params = FlaxViT(p).init({"params": jax.random.key(0)}, imgs[:1])
    e32 = FlaxViT(p).apply(params, imgs)
    e16 = FlaxViT(p, dtype=jnp.bfloat16).apply(params, imgs)
    assert cos(e32, e16).min() > 0.99

    mp = ModernBertParams(vocab_size=64, hidden_size=16, intermediate_size=24,
                          num_layers=2, num_heads=2, global_every=2,
                          local_window=4)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 64, (4, 16)),
                      jnp.int32)
    mask = jnp.ones((4, 16), bool)
    bparams = FlaxModernBert(mp).init({"params": jax.random.key(1)}, ids, mask)
    t32 = FlaxModernBert(mp).apply(bparams, ids, mask)
    t16 = FlaxModernBert(mp, dtype=jnp.bfloat16).apply(bparams, ids, mask)
    assert cos(t32, t16).min() > 0.99
