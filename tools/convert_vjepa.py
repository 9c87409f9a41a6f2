"""Convert V-JEPA encoder + SSv2 attentive-probe checkpoints to the flax
``.npz`` consumed by ``titok_tpu/metrics/vjepa.py`` (JEDi features).

Usage:
    python tools/convert_vjepa.py vitl16.pth.tar ssv2-probe.pth.tar \
        vjepa_vitl16_ssv2.npz

The reference's JEDi downloads exactly these two artifacts and runs them
through the external jepa repo (``/root/reference/model/metrics/jedi.py:
24-70,78-99``). Matching here is by jepa-canonical parameter NAME:
encoder keys like ``patch_embed.proj.weight`` / ``blocks.{i}.attn.qkv.
weight`` / ``norm.weight`` (found under the checkpoint's ``encoder`` or
``target_encoder`` entry, with ``module.`` / ``backbone.`` prefixes
stripped) and probe keys like ``pooler.query_tokens`` / ``pooler.
cross_attention_block.*`` (under ``classifier``, ``module.`` stripped —
the same strip the reference does at ``jedi.py:95``). The probe's
``linear`` classification head is not converted: JEDi uses the pooled
feature, not class logits (``jedi.py:99,147``).

The golden test drives this converter on a random-weight torch mirror
with the same canonical names (``tests/torch_vjepa_mirror.py``).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _strip(key: str) -> str:
    for pre in ("module.", "backbone."):
        while key.startswith(pre):
            key = key[len(pre):]
    return key


def _dense(flat: dict, path: str, w: np.ndarray, b: np.ndarray | None):
    flat[f"{path}/kernel"] = np.ascontiguousarray(w.T)  # torch [out,in]
    if b is not None:
        flat[f"{path}/bias"] = b


def _norm(flat: dict, path: str, w: np.ndarray, b: np.ndarray):
    flat[f"{path}/scale"] = w
    flat[f"{path}/bias"] = b


def convert_encoder(sd: dict) -> dict:
    """jepa VisionTransformer state dict -> flat flax params under
    ``encoder/``."""
    sd = {_strip(k): np.asarray(v) for k, v in sd.items()}
    flat: dict = {}
    # Conv3d weight [D, 3, kt, kh, kw] -> flax [kt, kh, kw, 3, D]
    flat["encoder/patch_embed/kernel"] = np.ascontiguousarray(
        sd["patch_embed.proj.weight"].transpose(2, 3, 4, 1, 0))
    flat["encoder/patch_embed/bias"] = sd["patch_embed.proj.bias"]
    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("blocks."))
    for i in range(n_blocks):
        t, f = f"blocks.{i}", f"encoder/blocks_{i}"
        _norm(flat, f"{f}/norm1", sd[f"{t}.norm1.weight"],
              sd[f"{t}.norm1.bias"])
        _dense(flat, f"{f}/attn/qkv", sd[f"{t}.attn.qkv.weight"],
               sd.get(f"{t}.attn.qkv.bias"))
        _dense(flat, f"{f}/attn/proj", sd[f"{t}.attn.proj.weight"],
               sd.get(f"{t}.attn.proj.bias"))
        _norm(flat, f"{f}/norm2", sd[f"{t}.norm2.weight"],
              sd[f"{t}.norm2.bias"])
        _dense(flat, f"{f}/mlp/fc1", sd[f"{t}.mlp.fc1.weight"],
               sd.get(f"{t}.mlp.fc1.bias"))
        _dense(flat, f"{f}/mlp/fc2", sd[f"{t}.mlp.fc2.weight"],
               sd.get(f"{t}.mlp.fc2.bias"))
    _norm(flat, "encoder/norm", sd["norm.weight"], sd["norm.bias"])
    return flat


def convert_probe(sd: dict) -> dict:
    """jepa AttentiveClassifier state dict (``pooler.*``; ``linear.*``
    ignored) -> flat flax params under ``pooler/``."""
    sd = {_strip(k): np.asarray(v) for k, v in sd.items()}
    flat: dict = {}
    flat["pooler/query_tokens"] = sd["pooler.query_tokens"]
    t = "pooler.cross_attention_block"
    _norm(flat, "pooler/norm1", sd[f"{t}.norm1.weight"],
          sd[f"{t}.norm1.bias"])
    _dense(flat, "pooler/xattn/q", sd[f"{t}.xattn.q.weight"],
           sd.get(f"{t}.xattn.q.bias"))
    _dense(flat, "pooler/xattn/kv", sd[f"{t}.xattn.kv.weight"],
           sd.get(f"{t}.xattn.kv.bias"))
    _dense(flat, "pooler/xattn/proj", sd[f"{t}.xattn.proj.weight"],
           sd.get(f"{t}.xattn.proj.bias"))
    _norm(flat, "pooler/norm2", sd[f"{t}.norm2.weight"],
          sd[f"{t}.norm2.bias"])
    _dense(flat, "pooler/mlp/fc1", sd[f"{t}.mlp.fc1.weight"],
           sd.get(f"{t}.mlp.fc1.bias"))
    _dense(flat, "pooler/mlp/fc2", sd[f"{t}.mlp.fc2.weight"],
           sd.get(f"{t}.mlp.fc2.bias"))
    return flat


def convert_mirror_state_dict(sd: dict) -> dict:
    """Full torch-mirror state dict (``encoder.*`` + ``pooler.*``) ->
    flat flax params; the golden-test entry point."""
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    probe = {k: v for k, v in sd.items() if k.startswith("pooler.")}
    flat = convert_encoder(enc)
    flat.update(convert_probe(probe))
    return flat


def main(argv: list[str]) -> int:
    import torch

    enc_path, probe_path, out_path = argv
    enc_ck = torch.load(enc_path, map_location="cpu", weights_only=False)
    for key in ("target_encoder", "encoder"):
        if isinstance(enc_ck, dict) and key in enc_ck:
            enc_ck = enc_ck[key]
            break
    probe_ck = torch.load(probe_path, map_location="cpu",
                          weights_only=False)
    if isinstance(probe_ck, dict) and "classifier" in probe_ck:
        probe_ck = probe_ck["classifier"]
    flat = convert_encoder(
        {k: v.numpy() for k, v in enc_ck.items()})
    flat.update(convert_probe(
        {k: v.numpy() for k, v in probe_ck.items()
         if not _strip(k).startswith("linear.")}))
    np.savez(out_path, **flat)
    print(f"wrote {len(flat)} arrays to {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
