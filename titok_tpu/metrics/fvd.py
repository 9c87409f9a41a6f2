"""Fréchet Video Distance (reference ``model/metrics/fvd.py``).

The Fréchet math ports directly (``fvd.py:90-104``): per-set mean +
covariance of pooled I3D activations, then
``|mu1-mu2|² + tr(S1 + S2 - 2 sqrtm(S1 S2))``.

Feature extractor: the reference auto-downloads a torchscript I3D from
Dropbox and hard-codes ``device='cuda:0'`` (``fvd.py:27-37``). This
framework is zero-egress and TPU-resident, so the extractor is pluggable:

- if ``TITOK_I3D_PATH`` (or the ``i3d_path`` arg) points at a local
  torchscript file, it runs on CPU torch;
- otherwise FVD raises a clear error at ``compute`` time (metrics config
  should omit 'fvd' when no extractor is available).

Preprocessing matches ``fvd.py:47-67``: trilinear resize to 224², repeat
the last frame up to a minimum of 10 frames, [-1, 1] inputs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from scipy.linalg import sqrtm


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """Reference ``fvd.py:95-104``."""
    diff = mu1 - mu2
    covmean = sqrtm(sigma1.dot(sigma2))
    if isinstance(covmean, tuple):  # older scipy returned (sqrtm, errest)
        covmean = covmean[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_stats(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reference ``fvd.py:90-93``."""
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


class I3DFeatureExtractor:
    """CPU-torch torchscript I3D wrapper (weights must be local)."""

    def __init__(self, path: str):
        import torch

        self.torch = torch
        self.model = torch.jit.load(path, map_location="cpu").eval()

    def __call__(self, video_bcthw: np.ndarray) -> np.ndarray:
        torch = self.torch
        with torch.no_grad():
            x = torch.from_numpy(np.asarray(video_bcthw, np.float32))
            x = self._preprocess(x)
            out = self.model(x, rescale=False, resize=False, return_features=True)
            return out.numpy()

    def _preprocess(self, x, target: int = 224, min_frames: int = 10):
        torch = self.torch
        import torch.nn.functional as F

        b, c, t, h, w = x.shape
        if h != target or w != target:
            x = F.interpolate(x, size=(t, target, target), mode="trilinear",
                              align_corners=False)
        if t < min_frames:  # repeat last frame (ref fvd.py:60-64)
            pad = x[:, :, -1:].repeat(1, 1, min_frames - t, 1, 1)
            x = torch.cat([x, pad], dim=2)
        return x


class FVDCalculator:
    """Accumulates real/fake I3D features over an eval epoch
    (reference ``fvd.py:26-88``)."""

    def __init__(self, i3d_path: Optional[str] = None):
        self.i3d_path = i3d_path or os.environ.get("TITOK_I3D_PATH")
        self._extractor = None
        self.reset()

    def _get_extractor(self):
        if self._extractor is None:
            if not self.i3d_path or not os.path.exists(self.i3d_path):
                raise RuntimeError(
                    "FVD needs local I3D weights: set TITOK_I3D_PATH or "
                    "training.eval.i3d_path to a converted .npz (preferred, "
                    "runs the JAX port on TPU — tools/convert_i3d.py) or a "
                    "torchscript .pt (zero-egress environment; the reference "
                    "downloads it from Dropbox, fvd.py:27-34)."
                )
            if self.i3d_path.endswith(".npz"):
                from titok_tpu.metrics.i3d import (
                    JaxI3DExtractor,
                    load_i3d_params,
                )

                self._extractor = JaxI3DExtractor(
                    load_i3d_params(self.i3d_path)
                )
            else:
                self._extractor = I3DFeatureExtractor(self.i3d_path)
        return self._extractor

    def update(self, recon_bcthw: np.ndarray, target_bcthw: np.ndarray) -> None:
        ex = self._get_extractor()
        self.fake_feats.append(ex(recon_bcthw))
        self.real_feats.append(ex(target_bcthw))

    def compute(self) -> float:
        real = np.concatenate(self.real_feats, axis=0)
        fake = np.concatenate(self.fake_feats, axis=0)
        return frechet_distance(*compute_stats(real), *compute_stats(fake))

    def reset(self) -> None:
        self.real_feats: list[np.ndarray] = []
        self.fake_feats: list[np.ndarray] = []
