"""LPIPS perceptual metric + Gram-matrix loss in JAX (NHWC, TPU-native).

Re-implementation of the reference's VGG16-feature LPIPS
(reference ``model/metrics/lpips_gram.py``):

- 5 VGG16 feature slices after relu1_2/2_2/3_3/4_3/5_3
  (``lpips_gram.py:85-124``),
- input scaling layer with fixed shift/scale constants
  (``lpips_gram.py:50-61``),
- channel-L2 feature normalization, squared diffs, learned 1x1 conv per
  slice, spatial average, sum over slices (``lpips_gram.py:184-201``),
- Gram-matrix MSE per slice, meaned over slices (``lpips_gram.py:148-152,
  204-210``).

Weights: the reference auto-downloads torchvision VGG16 + ``vgg.pth`` lin
layers (``lpips_gram.py:10-48``). This framework is zero-egress; weights
are loaded from a local ``.npz`` produced by ``tools/convert_lpips.py``
from those torch files. Without the file, a **seeded random init** is used
(randomized-VGG LPIPS — still a usable training signal) and a warning is
printed once.

Layout: NHWC convolutions (TPU-native; channel-last feeds the MXU without
transposes). All frames are fixed ``[K, s, s, 3]`` so the whole metric is
one static jitted subgraph inside the train step.
"""

from __future__ import annotations

import os
import warnings
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 'features' architecture: conv channel sizes with 'M' = maxpool
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512]
# indices (in conv-only counting) after which a slice ends:
# relu1_2=conv1, relu2_2=conv3, relu3_3=conv6, relu4_3=conv9, relu5_3=conv12
SLICE_AFTER_CONV = [1, 3, 6, 9, 12]
LPIPS_CHANNELS = [64, 128, 256, 512, 512]

# reference ScalingLayer constants (lpips_gram.py:53-58)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the 5 LPIPS feature slices (NHWC)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        conv_i = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    v, (3, 3), padding=1, name=f"conv{conv_i}",
                    dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
                x = nn.relu(x)
                if conv_i in SLICE_AFTER_CONV:
                    outs.append(x)
                conv_i += 1
        return outs


class LPIPS(nn.Module):
    """LPIPS + Gram loss. Input: two ``[K, H, W, 3]`` batches in [-1, 1].

    Returns ``(lpips_per_frame [K], gram_per_frame [K])``
    (reference ``lpips_gram.py:184-212``).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        net = VGG16Features(dtype=self.dtype, name="net")
        # one tower over the concatenated batch: halves the compiled graph
        # and doubles the conv batch (better MXU utilization) vs two passes
        K = x.shape[0]
        feats = net(_scale_input(jnp.concatenate([x, y], axis=0)))
        xs = [f[:K] for f in feats]
        ys = [f[K:] for f in feats]

        lpips = 0.0
        grams = []
        for k, (fx, fy) in enumerate(zip(xs, ys)):
            nx, ny = _normalize(fx), _normalize(fy)
            diff = (nx - ny) ** 2
            lin = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{k}",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(diff)
            lpips = lpips + jnp.mean(lin, axis=(1, 2, 3))  # spatial avg -> [K]

            gx = _gram(fx)
            gy = _gram(fy)
            grams.append(jnp.mean((gx - gy) ** 2, axis=(1, 2)))  # [K]
        gram = jnp.stack(grams, axis=-1).mean(-1)
        return lpips, gram


def _scale_input(x):
    return (x - _SHIFT) / _SCALE


def _normalize(f, eps: float = 1e-10):
    # reference normalize_tensor (second definition wins, lpips_gram.py:142-144):
    # x / (sqrt(sum(x^2) + eps) + eps)
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)
    return f / (norm + eps)


def _gram(f):
    K, H, W, C = f.shape
    fm = f.reshape(K, H * W, C)
    g = jnp.einsum("khc,khd->kcd", fm, fm, preferred_element_type=jnp.float32)
    return g / (H * W)


DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "weights", "lpips_vgg.npz")


def load_lpips_params(path: str | None = None, seed: int = 0) -> dict:
    """Load converted LPIPS params, or seeded-random fallback.

    The ``.npz`` keys follow the flax param tree flattened with '/':
    ``net/conv{i}/kernel`` (HWIO), ``net/conv{i}/bias``, ``lin{k}/kernel``.
    Produce it with ``tools/convert_lpips.py``.
    """
    import jax

    path = path or DEFAULT_WEIGHTS
    model = LPIPS()
    if os.path.exists(path):
        data = np.load(path)
        params = jax.tree_util.tree_map(lambda x: x, _unflatten(dict(data)))
        return params
    warnings.warn(
        "LPIPS weights not found at %s — using seeded random VGG features. "
        "Run tools/convert_lpips.py to convert the torch weights." % path
    )
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy, dummy)["params"]
    # Random lin kernels are sign-indefinite, so the "distance" they
    # produce has arbitrary sign and near-zero expectation (measured ~±1%
    # of the recon loss over a full 5k-step run). Real LPIPS lin weights
    # are non-negative (the official training projects them to >=0), and
    # the official non-learned baseline is an all-ones lin — a channel
    # SUM of squared normalized-feature diffs. Mirror both: |w|,
    # normalized per slice to mean 1 (sum = C_k), giving a positive
    # semi-metric on the baseline-LPIPS O(1) scale.
    for k in range(len(SLICE_AFTER_CONV)):
        lin = jnp.abs(params[f"lin{k}"]["kernel"])
        params[f"lin{k}"]["kernel"] = lin * (lin.size / jnp.sum(lin))
    return params


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree
