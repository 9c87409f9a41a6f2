"""Convert a torchvision ``inception_v3`` checkpoint (state dict, .pth) to
the flax ``.npz`` consumed by ``titok_tpu/metrics/inception_v3.py``.

Usage:
    python tools/convert_inception.py inception_v3_google.pth inception_v3.npz

Matching is BY NAME: torchvision's module names are stable and the flax
port mirrors them exactly (the reference slices the very same modules,
``/root/reference/model/metrics/metrics.py:185-205``). Each
``X.conv.weight`` pairs with the ``X.bn.*`` group and BatchNorm is folded
into inference scale/offset (eps=1e-3, torchvision ``BasicConv2d``);
``AuxLogits.*`` is dropped (not on the reference's sliced forward).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BN_EPS = 1e-3


def convert_state_dict(sd: dict) -> dict:
    """Torchvision state dict -> flat {'path/leaf': np.ndarray}."""
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.endswith("num_batches_tracked")
          and not k.startswith("AuxLogits.")}
    out = {}
    for key, w in sd.items():
        if not key.endswith(".conv.weight"):
            continue
        base = key[: -len(".conv.weight")]
        path = base.replace(".", "/")
        # torch [O, I, kH, kW] -> flax [kH, kW, I, O]
        out[f"{path}/conv/kernel"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        g = sd[f"{base}.bn.weight"].astype(np.float64)
        beta = sd[f"{base}.bn.bias"].astype(np.float64)
        mean = sd[f"{base}.bn.running_mean"].astype(np.float64)
        var = sd[f"{base}.bn.running_var"].astype(np.float64)
        scale = g / np.sqrt(var + BN_EPS)
        out[f"{path}/bn_scale"] = scale.astype(np.float32)
        out[f"{path}/bn_offset"] = (beta - mean * scale).astype(np.float32)
    # final classifier (metrics.py:205,231)
    out["fc/kernel"] = sd["fc.weight"].T.astype(np.float32)
    out["fc/bias"] = sd["fc.bias"].astype(np.float32)

    n_convs = sum(1 for k in out if k.endswith("conv/kernel"))
    assert n_convs == 94, (
        f"expected 94 BasicConv2d units, found {n_convs} — is this a "
        "torchvision inception_v3 state dict?"
    )
    return out


def load_torch_checkpoint(path: str) -> dict:
    import torch

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
