"""Portable serving artifacts for trained generators (`jax.export`).

The reference's only deployment artifact is a torch ``state_dict`` that can
be reloaded solely by re-importing the experiment file that defines the model
(/root/reference/src/conditional_gan_concat.py:869-877 rebuilds the nets from
the same script before `load_state_dict`). Here a trained generator exports
to a **self-contained StableHLO artifact**: the deterministic sampling
computation with the trained weights baked in as constants, serialized via
``jax.export``. Loading needs *no* model code, config tree, or checkpoint —
only a JAX runtime — and the artifact runs on every platform named at export
time (``cpu`` / ``tpu`` / ``cuda``), regardless of which devices were visible
when it was exported. StableHLO carries jax.export's compatibility guarantees
(old artifacts keep loading on newer runtimes), which makes this the
hand-off format between training and a serving fleet.

Layout on disk (a directory):

    <path>/generator.jaxexport   serialized Exported (StableHLO + weights)
    <path>/manifest.json         input signature: cond keys in call order,
                                 shapes/dtypes, latent dim, variant, platforms

The exported callable has signature ``(z, *cond_arrays) -> profiles`` with
``cond_arrays`` ordered exactly as ``manifest["cond_spec"]``; `z` is drawn by
the caller (or by :meth:`GeneratorArtifact.sample`), so the artifact is pure
— no PRNG state, byte-identical outputs for identical inputs on a platform.
The batch dimension AND the token/patch sequence lengths are symbolic by
default: one artifact serves any batch size and any patch count (no fusion
module has sequence-length-dependent params; padding masks work exactly as
in training).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

ARTIFACT_FILE = "generator.jaxexport"
MANIFEST_FILE = "manifest.json"
FORMAT_VERSION = 1

# conditioning keys each fusion kind reads (fusion/modules.py __call__ bodies);
# the export signature carries exactly these, in this canonical order
_KIND_KEYS = {
    "none": (),
    "concat": None,  # depends on condition_type, resolved below
    "attention": ("text_emb", "patches", "patch_mask"),
    "img_transformer": ("patches", "patch_mask"),
    "film": ("text_emb", "patches", "patch_mask"),
    "xattn": ("tokens", "token_mask", "patches", "patch_mask"),
    "film_xattn": ("tokens", "token_mask", "patches", "patch_mask"),
    "labels": ("disease", "site"),
}


def cond_keys_for(fusion_cfg) -> Tuple[str, ...]:
    """The conditioning keys a fusion config consumes, in call order."""
    keys = _KIND_KEYS.get(fusion_cfg.kind)
    if keys is not None:
        return keys
    if fusion_cfg.kind == "concat":
        return (("text_emb",) if fusion_cfg.condition_type == "text"
                else ("patches", "patch_mask"))
    raise ValueError(f"unknown fusion kind {fusion_cfg.kind!r}")


# keys whose axis-1 is a sequence length, and the symbolic dim that models it
_SEQ_AXIS = {"tokens": "t", "token_mask": "t",
             "patches": "p", "patch_mask": "p"}


def _signature(keys, sample_batch, latent_dim, batch_size, dynamic_seq):
    """Build the export input signature: (z struct, cond structs, manifest
    cond_spec, batch descriptor). One shared symbolic scope covers every
    dynamic dim (b, and the sequence lengths present in the signature)."""
    import jax
    from jax import export as jax_export

    sym_names = []
    if batch_size is None:
        sym_names.append("b")
    if dynamic_seq:
        sym_names += sorted({_SEQ_AXIS[k] for k in keys if k in _SEQ_AXIS})
    sym = dict(zip(sym_names, jax_export.symbolic_shape(
        ", ".join(sym_names)))) if sym_names else {}
    batch = sym["b"] if batch_size is None else int(batch_size)
    batch_desc: Any = "dynamic" if batch_size is None else int(batch_size)

    def _struct(key, shape, dtype):
        dims: list = [batch] + list(shape[1:])
        names: list = [batch_desc if batch_size is not None else "b"] \
            + [int(d) for d in shape[1:]]
        if dynamic_seq and key in _SEQ_AXIS:
            dims[1] = sym[_SEQ_AXIS[key]]
            names[1] = _SEQ_AXIS[key]
        return jax.ShapeDtypeStruct(tuple(dims), dtype), names

    z_struct, _ = _struct("z", (1, latent_dim), np.float32)
    cond_structs, cond_spec = [], []
    for k in keys:
        a = np.asarray(sample_batch[k])
        s, names = _struct(k, a.shape, a.dtype)
        cond_structs.append(s)
        cond_spec.append({"key": k, "shape": names, "dtype": str(a.dtype)})
    return z_struct, cond_structs, cond_spec, batch_desc


@dataclass
class GeneratorArtifact:
    """A loaded (or just-exported) serving artifact.

    ``exported`` is the `jax.export.Exported`; ``manifest`` the input
    signature. Call it with ``(z, cond_dict)`` or draw latents with
    :meth:`sample`.
    """

    exported: Any
    manifest: Dict[str, Any]

    # ------------------------------------------------------------------ call
    def _cond_tuple(self, cond: Optional[Dict[str, Any]]):
        spec = self.manifest["cond_spec"]
        if not spec:
            return ()
        if cond is None:
            raise ValueError(
                f"artifact requires conditioning inputs "
                f"{[s['key'] for s in spec]}, got none")
        out = []
        for s in spec:
            if s["key"] not in cond:
                raise ValueError(f"conditioning missing key {s['key']!r} "
                                 f"(artifact needs {[t['key'] for t in spec]})")
            out.append(cond[s["key"]])
        return tuple(out)

    def __call__(self, z, cond: Optional[Dict[str, Any]] = None):
        """z [B, latent] (+ cond dict) -> profiles [B, n_genes]."""
        return self.exported.call(z, *self._cond_tuple(cond))

    def sample(self, key, n: Optional[int] = None,
               cond: Optional[Dict[str, Any]] = None):
        """Draw z ~ N(0,1) under `key` and generate.

        `n` defaults to the conditioning batch size (required when the
        artifact is unconditional)."""
        import jax

        ct = self._cond_tuple(cond)
        if n is None:
            if not ct:
                raise ValueError("unconditional artifact: pass n")
            n = np.shape(ct[0])[0]
        z = jax.random.normal(key, (n, self.manifest["latent_dim"]))
        return self.exported.call(z, *ct)

    # ------------------------------------------------------------------- io
    def save(self, path: str) -> str:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, ARTIFACT_FILE), "wb") as f:
            f.write(self.exported.serialize())
        with open(os.path.join(path, MANIFEST_FILE), "w") as f:
            json.dump(self.manifest, f, indent=2)
        return path

    @classmethod
    def load(cls, path: str) -> "GeneratorArtifact":
        from jax import export as jax_export

        with open(os.path.join(path, ARTIFACT_FILE), "rb") as f:
            exported = jax_export.deserialize(bytearray(f.read()))
        with open(os.path.join(path, MANIFEST_FILE)) as f:
            manifest = json.load(f)
        if manifest.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest.get('format_version')} != "
                f"{FORMAT_VERSION}")
        return cls(exported=exported, manifest=manifest)


def export_generator(engine, state, sample_batch: Dict[str, Any], *,
                     platforms: Sequence[str] = ("tpu", "cpu"),
                     batch_size: Optional[int] = None,
                     dynamic_seq: bool = True,
                     use_ema: Optional[bool] = None) -> GeneratorArtifact:
    """Export a trained generator as a portable serving artifact.

    ``engine``/``state``: a `WGANGPEngine` and its (trained) state; the
    generator params (EMA params with ``use_ema``, engine default rules)
    are fetched to host and baked into the artifact as constants.
    ``sample_batch``: any batch from the run's loader — only the conditioning
    shapes/dtypes are read. ``batch_size``: fix a static batch, or None
    (default) for a symbolic batch dimension (any size at call time).
    ``dynamic_seq`` (default True): export the token/patch sequence lengths
    as symbolic dims too — one artifact serves any patch count / token
    length (no fusion module has sequence-length-dependent params; masks
    handle padding exactly as in training).

    The exported computation is the deterministic sampling path:
    ``score(z, embed_cond(cond))`` — identical to
    ``generate_samples``' forward (train/wgan.py), minus the PRNG (z is an
    input).

    Note: exports lower through the XLA path; configs with
    ``fusion.use_pallas=True`` bake TPU-only Mosaic kernels into the
    artifact, so multi-platform exports (the default) require
    ``use_pallas=False``; the Pallas kernels' block grids are also
    shape-specialized, so combine ``use_pallas`` only with
    ``dynamic_seq=False`` and a static ``batch_size``.
    """
    import jax
    from jax import export as jax_export

    cfg = engine.cfg
    gen = engine.gen
    params = jax.tree.map(np.asarray,
                          jax.device_get(engine._gen_params(state, use_ema)))
    keys = cond_keys_for(cfg.model.fusion)
    missing = [k for k in keys if k not in sample_batch]
    if missing:
        raise ValueError(f"sample_batch lacks conditioning keys {missing}")

    (z_struct, cond_structs, cond_spec, batch_desc) = _signature(
        keys, sample_batch, cfg.model.latent_dim, batch_size, dynamic_seq)

    if keys:
        def fn(z, *cond_vals):
            cond = dict(zip(keys, cond_vals))
            cvec = gen.apply({"params": params}, cond, deterministic=True,
                             method="embed_cond")
            return gen.apply({"params": params}, z, cvec, method="score")
    else:
        def fn(z):
            return gen.apply({"params": params}, z, None, method="score")

    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        z_struct, *cond_structs)
    manifest = {
        "format_version": FORMAT_VERSION,
        "variant": cfg.variant,
        "fusion_kind": cfg.model.fusion.kind,
        "latent_dim": int(cfg.model.latent_dim),
        "n_genes": int(cfg.model.n_genes),
        "batch": batch_desc,
        "platforms": list(platforms),
        "ema": bool(use_ema if use_ema is not None
                    else state.g_ema is not None),
        "cond_spec": cond_spec,
    }
    return GeneratorArtifact(exported=exported, manifest=manifest)


def export_vae_decoder(engine, state, sample_batch: Dict[str, Any], *,
                       platforms: Sequence[str] = ("tpu", "cpu"),
                       batch_size: Optional[int] = None) -> GeneratorArtifact:
    """Export a trained VAE/CVAE decoder as a serving artifact.

    Same artifact format as :func:`export_generator`: the exported callable
    is ``(z, *labels) -> profiles`` with ``z [B, vae_latent_dim]`` (the
    CVAE signature carries ``disease``/``site`` int vectors), so
    :meth:`GeneratorArtifact.sample` reproduces the engines' decode-from-
    prior sampling (reference: /root/reference/src/vae/vanilla_vae.py:172-179,
    src/vae/cvae.py:388-398) bit-for-bit given the same z.
    """
    import jax
    from jax import export as jax_export

    cfg = engine.cfg
    model = engine.model
    params = jax.tree.map(np.asarray, jax.device_get(state.params))
    keys = ("disease", "site") if engine.conditional else ()
    missing = [k for k in keys if k not in sample_batch]
    if missing:
        raise ValueError(f"sample_batch lacks label keys {missing}")

    (z_struct, cond_structs, cond_spec, batch_desc) = _signature(
        keys, sample_batch, cfg.model.vae_latent_dim, batch_size, False)

    if engine.conditional:
        def fn(z, disease, site):
            return model.apply({"params": params}, z, disease, site,
                               method="decode")
    else:
        def fn(z):
            return model.apply({"params": params}, z, method="decode")

    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        z_struct, *cond_structs)
    manifest = {
        "format_version": FORMAT_VERSION,
        "variant": cfg.variant,
        "fusion_kind": "labels" if engine.conditional else "none",
        "latent_dim": int(cfg.model.vae_latent_dim),
        "n_genes": int(cfg.model.n_genes),
        "batch": batch_desc,
        "platforms": list(platforms),
        "ema": False,
        "cond_spec": cond_spec,
    }
    return GeneratorArtifact(exported=exported, manifest=manifest)
