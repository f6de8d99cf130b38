"""Turnkey conversion of the REAL pretrained encoder checkpoints.

The reference loads UNI (timm `hf-hub:MahmoodLab/uni`, ViT-L/16 + LayerScale,
/root/reference/src/download_and_preprocess_data.py:321-323) and Clinical
ModernBERT (`Simonlee711/Clinical_ModernBERT`, ModernBERT-base,
src/preprocessing/save_text_embeddings.py:30-33) at runtime from the HF hub.
This environment has no network, so parity is proven on tiny random configs
(tests/test_encoders.py); this command is the missing last mile: point it at
checkpoints (an explicit file/dir, or the standard HF cache once a
network-enabled machine has populated it) and it converts them to Flax
params, **validates the layout against the published dims** (1024-d ViT-L/16
with LayerScale, 24 layers; 768-d ModernBERT-base, 22 layers), and writes a
msgpack + manifest (sha256, param count) so the first real-weight run needs
no debugging.

  python -m gemm_gan_tpu.cli.convert_encoders --out /data/encoders \
      [--uni MahmoodLab/uni | /path/to/pytorch_model.bin] \
      [--modernbert Simonlee711/Clinical_ModernBERT | /path/to/dir]

Consume the outputs with `load_converted(path)`:

  params = load_converted("/data/encoders/uni_vit_l16.msgpack")
  embed = jax.jit(lambda x: FlaxViT().apply({"params": params}, x))
  build_patch_cache(embed, tiles_by_case, out_dir)   # encoders/cache.py
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
from typing import Dict, Optional

import numpy as np

# Checkpoint filenames in preference order: safetensors loads without
# unpickling torch tensors; .bin is the UNI hub layout.
_CANDIDATES = ("model.safetensors", "pytorch_model.bin")


def find_checkpoint(spec: str) -> str:
    """Resolve `spec` (file, dir, or HF hub id) to a checkpoint file.

    Hub ids are resolved against the local HF cache only
    (`$HF_HOME/hub/models--ORG--NAME/snapshots/*/`) — this command never
    touches the network; populate the cache elsewhere with
    `huggingface-cli download <id>`.
    """
    if os.path.isfile(spec):
        return spec
    roots = [spec] if os.path.isdir(spec) else []
    if "/" in spec and not roots:  # hub id -> HF cache layout
        repo = os.path.join(
            os.environ.get("HF_HOME",
                           os.path.expanduser("~/.cache/huggingface")),
            "hub", "models--" + spec.replace("/", "--"))
        snaps = sorted(glob.glob(os.path.join(repo, "snapshots", "*")))
        # The snapshot refs/main points to is the current revision; a bare
        # lexicographic sort of commit hashes says nothing about recency
        # and could silently convert a STALE checkpoint when the cache
        # holds several revisions.
        rev = None
        try:
            with open(os.path.join(repo, "refs", "main")) as f:
                rev = f.read().strip()
        except OSError:
            pass
        current = os.path.join(repo, "snapshots", rev) if rev else None
        if current and os.path.isdir(current):
            snaps = [current] + [s for s in snaps if s != current]
        elif len(snaps) > 1:
            # No usable refs/main (missing file OR dangling ref): fall back
            # to newest-mtime, and warn naming the ACTUAL pick.
            snaps.sort(key=os.path.getmtime, reverse=True)
            print(f"warning: {spec}: {len(snaps)} cached snapshots and no "
                  f"usable refs/main — picking {snaps[0]} (newest mtime "
                  f"wins); pass an explicit path to be sure", flush=True)
        roots = snaps
    for root in roots:
        for name in _CANDIDATES:
            path = os.path.join(root, name)
            if os.path.isfile(path):
                return path
    raise FileNotFoundError(
        f"no checkpoint for {spec!r}: looked for {_CANDIDATES} in "
        f"{roots or ['<HF cache>']}; download it on a network-enabled "
        f"machine with `huggingface-cli download {spec}` or pass an "
        f"explicit file path")


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/safetensors checkpoint as a name->numpy dict.

    bf16 checkpoints (common for re-uploaded encoder weights) are upcast to
    float32 here: numpy has no bfloat16, so both `torch.Tensor.numpy()` and
    the safetensors numpy loader reject them outright — and the converters
    cast to f32 anyway (`_t`), so the upcast is lossless for our purpose.
    """

    def to_numpy(v) -> np.ndarray:
        import torch

        return (v.float() if v.dtype == torch.bfloat16 else v).numpy()

    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return dict(load_file(path))
        except Exception:
            # numpy loader cannot represent bf16 tensors — reload via torch
            from safetensors.torch import load_file as load_torch

            return {k: to_numpy(v) for k, v in load_torch(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    return {k: to_numpy(v) for k, v in sd.items()}


def _save(params: Dict, out_path: str, meta: Dict) -> Dict:
    from flax import serialization

    blob = serialization.msgpack_serialize(params)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    manifest = dict(meta, sha256=hashlib.sha256(blob).hexdigest(),
                    bytes=len(blob), path=os.path.abspath(out_path))
    with open(out_path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_converted(path: str) -> Dict:
    """Restore a converted params pytree written by this command."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _convert_or_explain(convert, sd, p, checkpoint: str, arch: str):
    """Run a state-dict converter; turn a missing torch key into a clear
    'this checkpoint is not the published architecture' diagnostic instead
    of a bare KeyError."""
    try:
        return convert(sd, p)
    except KeyError as e:
        raise SystemExit(
            f"{checkpoint}: missing torch key {e} — not a {arch} checkpoint "
            f"(expected the published architecture {p}); pass the real "
            f"weights or adjust the params") from e


def convert_uni(checkpoint: str, out_dir: str) -> Dict:
    """UNI timm checkpoint -> validated FlaxViT params msgpack."""
    from gemm_gan_tpu.encoders.vit import (ViTParams,
                                           convert_timm_vit_state_dict,
                                           validate_vit_layout)

    p = ViTParams()  # published UNI dims: ViT-L/16, LayerScale, 224x224
    params = _convert_or_explain(convert_timm_vit_state_dict,
                                 load_state_dict(checkpoint), p,
                                 checkpoint, "UNI ViT-L/16")
    n = validate_vit_layout(params, p)
    return _save(params, os.path.join(out_dir, "uni_vit_l16.msgpack"),
                 {"model": "uni_vit_l16", "source": checkpoint,
                  "param_count": n, "hidden_size": p.hidden_size,
                  "num_layers": p.num_layers})


def convert_modernbert(checkpoint: str, out_dir: str) -> Dict:
    """Clinical ModernBERT HF checkpoint -> validated FlaxModernBert msgpack.

    Reads a `config.json` next to the checkpoint when present (exact dims
    from the published config); falls back to the ModernBERT-base defaults.
    """
    from gemm_gan_tpu.encoders.modernbert import (
        ModernBertParams, convert_modernbert_state_dict, params_from_config,
        validate_modernbert_layout)

    cfg_path = os.path.join(os.path.dirname(checkpoint), "config.json")
    p: Optional[ModernBertParams] = None
    if os.path.isfile(cfg_path):
        import types

        with open(cfg_path) as f:
            raw = json.load(f)
        raw.setdefault("local_rope_theta", None)
        p = params_from_config(types.SimpleNamespace(**raw))
    params = _convert_or_explain(convert_modernbert_state_dict,
                                 load_state_dict(checkpoint), p,
                                 checkpoint, "ModernBERT")
    n = validate_modernbert_layout(params, p)
    p = p or ModernBertParams()
    return _save(params, os.path.join(out_dir, "clinical_modernbert.msgpack"),
                 {"model": "clinical_modernbert", "source": checkpoint,
                  "param_count": n, "hidden_size": p.hidden_size,
                  "num_layers": p.num_layers})


def build_parser():
    ap = argparse.ArgumentParser(
        description="convert real UNI / Clinical ModernBERT checkpoints "
                    "to validated Flax params")
    ap.add_argument("--uni", default=None,
                    help="checkpoint file, dir, or hub id (MahmoodLab/uni)")
    ap.add_argument("--modernbert", default=None,
                    help="checkpoint file, dir, or hub id "
                         "(Simonlee711/Clinical_ModernBERT)")
    ap.add_argument("--out", required=True, help="output directory")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not (args.uni or args.modernbert):
        build_parser().error("pass --uni and/or --modernbert")
    for name, spec, fn in (("uni", args.uni, convert_uni),
                           ("modernbert", args.modernbert, convert_modernbert)):
        if spec is None:
            continue
        manifest = fn(find_checkpoint(spec), args.out)
        print(json.dumps({"converted": name, **manifest}), flush=True)


if __name__ == "__main__":
    main()
