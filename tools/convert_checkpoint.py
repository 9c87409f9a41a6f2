"""Convert reference PyTorch TiTok checkpoints <-> this framework's params.

The reference saves a Lightning checkpoint whose ``state_dict`` carries the
tokenizer under ``model.`` and the discriminator under
``loss_module.disc_model.`` (reference ``train.py:218-220``). Key mapping
(torch module path -> flax param tree path):

    encoder.proj_in.{weight,bias}            encoder/proj_in/{kernel.T,bias}
    encoder.mask_token                       encoder/mask_token
    encoder.ln_pre_t.weight                  encoder/ln_pre_t/weight
    encoder.model_layers.attn_layer.I.*      encoder/model_layers/attn_I/*
    encoder.model_layers.ffd_layer.I.*       encoder/model_layers/ffd_I/*
    encoder.model_layers.attn_post_ln.J.*    encoder/model_layers/attn_post_ln_J/*
    encoder.model_layers.ffd_post_ln.J.*     encoder/model_layers/ffd_post_ln_J/*
    encoder.proj_out.{weight,bias}           encoder/proj_out/{kernel.T,bias}
    decoder.*                                (mirror)

Linear weights transpose (torch [out,in] -> flax kernel [in,out]); norm
weights and mask tokens copy as-is. FSQ has no parameters; EMA-VQ codebooks
are not present in reference checkpoints.

Usage:
    python tools/convert_checkpoint.py torch2flax ckpt.pt out_dir/  # -> orbax
    python tools/convert_checkpoint.py flax2torch ckpt_dir/ out.pt
"""

from __future__ import annotations

import re
import os
import sys

# allow running as `python tools/<name>.py` from the repo root: python puts
# tools/ on sys.path, not the cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_LINEAR = {"proj_in", "proj_out", "to_qkv", "out_proj", "w12", "w3"}


def _flax_path(torch_key: str) -> tuple[str, ...] | None:
    """Map a (prefix-stripped) reference torch key to a flax tree path."""
    parts = torch_key.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("attn_layer", "ffd_layer", "attn_post_ln", "ffd_post_ln"):
            idx = parts[i + 1]
            base = {"attn_layer": "attn", "ffd_layer": "ffd"}.get(p, p)
            out.append(f"{base}_{idx}")
            i += 2
            continue
        out.append(p)
        i += 1
    if out[-1] == "weight" and _is_linear(out[-2]):
        out[-1] = "kernel"
    return tuple(out)


def _is_linear(mod_name: str) -> bool:
    base = re.sub(r"_\d+$", "", mod_name)
    return base in _LINEAR


def torch_sd_to_flax(sd: dict, prefix: str = "model.") -> dict:
    """Torch state dict -> flax params tree (numpy leaves)."""
    tree: dict = {}
    for key, val in sd.items():
        if prefix and not key.startswith(prefix):
            continue
        k = key[len(prefix):] if prefix else key
        if k.startswith(("quantize.", "_orig_mod.")):
            k = k.replace("_orig_mod.", "")
            if k.startswith("quantize."):
                continue  # FSQ buffers (non-persistent, derivable)
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach")
                         else val, np.float32)
        path = _flax_path(k)
        if path is None:
            continue
        if path[-1] == "kernel":
            arr = arr.T  # torch [out, in] -> flax [in, out]
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return tree


def flax_to_torch_sd(params: dict, prefix: str = "model.") -> dict:
    """Flax params tree -> reference-layout torch state dict (numpy)."""
    out: dict[str, np.ndarray] = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                out_path = []
                for p in path + [k]:
                    m = re.fullmatch(r"(attn|ffd|attn_post_ln|ffd_post_ln)_(\d+)", p)
                    if m:
                        base = {"attn": "attn_layer", "ffd": "ffd_layer"}.get(
                            m.group(1), m.group(1))
                        out_path += [base, m.group(2)]
                    else:
                        out_path.append(p)
                leaf = out_path[-1]
                arr = np.asarray(v, np.float32)
                if leaf == "kernel":
                    out_path[-1] = "weight"
                    arr = arr.T
                out[prefix + ".".join(out_path)] = arr

    walk(params, [])
    return out


def main():
    mode, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    if mode == "torch2flax":
        import torch

        ckpt = torch.load(src, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        tree = torch_sd_to_flax(sd)
        import orbax.checkpoint as ocp

        ocp.StandardCheckpointer().save(dst, tree)
        print(f"saved flax params to {dst}")
    elif mode == "flax2torch":
        import orbax.checkpoint as ocp
        import torch

        from titok_tpu.train_utils.checkpoints import restore_raw

        tree = restore_raw(ocp.StandardCheckpointer(), src)
        sd = {k: torch.from_numpy(np.asarray(v))
              for k, v in flax_to_torch_sd(tree).items()}
        torch.save({"state_dict": sd}, dst)
        print(f"saved torch checkpoint to {dst}")
    else:
        raise SystemExit("mode must be torch2flax or flax2torch")


if __name__ == "__main__":
    main()
