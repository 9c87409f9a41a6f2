"""Convert a torch InceptionI3d checkpoint (torchscript or state dict) to
the flax ``.npz`` consumed by ``titok_tpu/metrics/i3d.py``.

Usage:
    python tools/convert_i3d.py i3d_torchscript.pt i3d_kinetics400.npz

Matching is STRUCTURAL (by definition order + shape), not by name, so it
tolerates the naming differences between pytorch-i3d variants and the
torchscript the reference downloads (``/root/reference/model/metrics/
fvd.py:27-34``): convs are the 5-D weights in state-dict order, each
non-logits conv is paired with the BatchNorm group that follows it, and
BN is folded into inference scale/offset (eps=1e-3, pytorch-i3d Unit3D).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BN_EPS = 1e-3


def flax_conv_paths():
    """Ordered flax param prefixes matching torch definition order."""
    paths = ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"]
    for blk in ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
                "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"):
        paths += [f"{blk}/{br}" for br in ("b0", "b1a", "b1b", "b2a", "b2b",
                                           "b3")]
    paths.append("logits")
    return paths


def convert_state_dict(sd: dict) -> dict:
    """Torch state dict -> flat {'path/leaf': np.ndarray} for np.savez."""
    items = [(k, np.asarray(v)) for k, v in sd.items()
             if not k.endswith("num_batches_tracked")]

    units = []  # (conv_w, conv_b|None, bn tuple|None) in order
    i = 0
    while i < len(items):
        k, v = items[i]
        if v.ndim != 5:
            i += 1
            continue
        conv_w = v
        conv_b = None
        bn = None
        j = i + 1
        one_d = []
        while j < len(items) and items[j][1].ndim == 1 and len(one_d) < 4:
            one_d.append(items[j][1])
            j += 1
        if len(one_d) >= 4:
            bn = one_d[:4]  # weight, bias, running_mean, running_var
        elif len(one_d) >= 1:
            conv_b = one_d[0]
        units.append((conv_w, conv_b, bn))
        i = j if (bn or conv_b is not None) else i + 1

    paths = flax_conv_paths()
    assert len(units) == len(paths), (
        f"expected {len(paths)} conv units, found {len(units)} — "
        "is this a Kinetics-400 InceptionI3d checkpoint?"
    )

    out = {}
    for path, (w, b, bn) in zip(paths, units):
        # torch [O, I, kT, kH, kW] -> flax [kT, kH, kW, I, O]
        out[f"{path}/conv/kernel"] = w.transpose(2, 3, 4, 1, 0).astype(
            np.float32
        )
        if bn is not None:
            g, beta, mean, var = (x.astype(np.float64) for x in bn)
            scale = g / np.sqrt(var + BN_EPS)
            out[f"{path}/bn_scale"] = scale.astype(np.float32)
            out[f"{path}/bn_offset"] = (beta - mean * scale).astype(np.float32)
        if b is not None:
            out[f"{path}/conv/bias"] = b.astype(np.float32)
    return out


def load_torch_checkpoint(path: str) -> dict:
    import torch

    try:
        mod = torch.jit.load(path, map_location="cpu")
        return {k: v.detach().numpy() for k, v in mod.state_dict().items()}
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        return {k: v.detach().numpy() for k, v in sd.items()}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    flat = convert_state_dict(load_torch_checkpoint(src))
    np.savez(dst, **flat)
    print(f"{src} -> {dst}: {len(flat)} tensors")


if __name__ == "__main__":
    main()
