"""Convert the reference's torch LPIPS weights to this framework's .npz.

Inputs (both optional, but at least one needed for real LPIPS):
- a torchvision VGG16 state dict (``vgg16-*.pth`` from
  torchvision.models, or any state dict with ``features.N.weight`` keys);
- the LPIPS ``vgg.pth`` linear-layer weights the reference downloads
  (reference ``model/metrics/lpips_gram.py:10-19``, md5
  d507d7349b931f0638a25a48a722f98a) with ``lin{k}.model.1.weight`` keys.

Output: ``titok_tpu/losses/weights/lpips_vgg.npz`` with flax-tree keys
(``net/conv{i}/kernel`` in HWIO, ``lin{k}/kernel``), which
``titok_tpu.losses.lpips.load_lpips_params`` picks up automatically.

Usage:
    python tools/convert_lpips.py --vgg vgg16.pth --lins vgg.pth \
        [--out path.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running as `python tools/<name>.py` from the repo root: python puts
# tools/ on sys.path, not the cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# torchvision 'features' indices of the 13 conv layers in VGG16
TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert(vgg_path: str | None, lins_path: str | None, out_path: str,
            seed: int = 0) -> dict:
    import torch

    flat: dict[str, np.ndarray] = {}

    if vgg_path:
        sd = torch.load(vgg_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        # accept either bare features.* keys or full-model keys
        def get(k):
            for prefix in ("features.", "net.features.", ""):
                kk = prefix + k
                if kk in sd:
                    return sd[kk].numpy()
            raise KeyError(k)

        for ci, ti in enumerate(TORCH_CONV_IDX):
            w = get(f"{ti}.weight")  # torch OIHW
            b = get(f"{ti}.bias")
            flat[f"net/conv{ci}/kernel"] = w.transpose(2, 3, 1, 0)  # -> HWIO
            flat[f"net/conv{ci}/bias"] = b

    if lins_path:
        sd = torch.load(lins_path, map_location="cpu", weights_only=False)
        for k in range(5):
            for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
                if key in sd:
                    w = sd[key].numpy()  # [1, C, 1, 1] OIHW
                    flat[f"lin{k}/kernel"] = w.transpose(2, 3, 1, 0)
                    break
            else:
                raise KeyError(f"lin{k} weights not found in {lins_path}")

    if not flat:
        raise SystemExit("provide --vgg and/or --lins")

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **flat)
    print(f"wrote {len(flat)} arrays to {out_path}")
    return flat


def main():
    from titok_tpu.losses.lpips import DEFAULT_WEIGHTS

    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", help="torchvision vgg16 state dict (.pth)")
    ap.add_argument("--lins", help="LPIPS vgg.pth linear-layer weights")
    ap.add_argument("--out", default=DEFAULT_WEIGHTS)
    args = ap.parse_args()
    convert(args.vgg, args.lins, args.out)


if __name__ == "__main__":
    main()
