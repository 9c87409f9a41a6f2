"""InceptionV3 (torchvision layout) in JAX — the legacy FID/IS/MMD image
feature extractor, TPU-resident.

The reference's legacy image-metric calculator hardwires a torchvision
``inception_v3(weights=IMAGENET1K_V1)`` on the training device and slices
its modules into a feature forward that upsamples to 299², runs the stem +
all Mixed blocks, global-average-pools to 2048-d activations, and applies
the 1000-way fc for Inception-Score probs (reference
``model/metrics/metrics.py:185-231``).

This is a faithful inference-only port of that exact graph: BatchNorm is
folded to per-channel ``scale * x + offset`` (the converter bakes running
stats in — ``tools/convert_inception.py``), convs run NHWC with torch's
explicit paddings, the input upsample is bilinear with
``align_corners=True`` (reference ``metrics.py:207``), and avg-pools use
``count_include_pad=True`` (torch default). Golden-tested against the
torchvision module with shared (random) weights in
``tests/test_inception_v3.py``.

Weights must be staged locally (zero egress): convert a torchvision
``inception_v3`` state dict once with ``tools/convert_inception.py`` and
pass the ``.npz`` to :class:`JaxInceptionExtractor` (config key
``training.eval.inception_path`` / env ``TITOK_INCEPTION_PATH``).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# per-block 1x1-pool-branch widths / 7x7 bottleneck widths (torchvision
# Inception3.__init__)
POOL_FEATURES = {"Mixed_5b": 32, "Mixed_5c": 64, "Mixed_5d": 64}
C7 = {"Mixed_6b": 128, "Mixed_6c": 160, "Mixed_6d": 160, "Mixed_6e": 192}


class BasicConv2d(nn.Module):
    """Conv2d (no bias) + folded BatchNorm(eps=1e-3) + ReLU
    (torchvision ``BasicConv2d``)."""

    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(
            self.features, self.kernel, strides=self.stride,
            padding=((ph, ph), (pw, pw)), use_bias=False, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        offset = self.param("bn_offset", nn.initializers.zeros, (self.features,))
        return nn.relu(x * scale + offset)


def _avg_pool_3x3_same(x):
    # torch F.avg_pool2d(x, 3, stride=1, padding=1): count_include_pad=True
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int):
    """``nn.Upsample(mode='bilinear', align_corners=True)`` semantics
    (reference ``metrics.py:207``): source coords are ``linspace(0, n-1)``,
    NOT half-pixel centers — so ``jax.image.resize`` (half-pixel) is wrong
    here. Separable gather-based linear interpolation, NHWC."""

    def axis_interp(arr, n_out, axis):
        n_in = arr.shape[axis]
        if n_in == n_out:
            return arr
        if n_out == 1:
            coords = jnp.zeros((1,), jnp.float32)
        else:
            coords = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (coords - lo).astype(arr.dtype)
        shape = [1] * arr.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        return (jnp.take(arr, lo, axis=axis) * (1 - w)
                + jnp.take(arr, hi, axis=axis) * w)

    x = axis_interp(x, out_h, 1)
    return axis_interp(x, out_w, 2)


class InceptionV3(nn.Module):
    """Returns ``(activations [N, 2048], logits [N, 1000])`` from NHWC
    images in [-1, 1], exactly the reference's sliced forward
    (``metrics.py:206-231``)."""

    num_classes: int = 1000
    resize_to: int = 299

    @nn.compact
    def __call__(self, x):
        if self.resize_to:
            x = resize_bilinear_align_corners(x, self.resize_to, self.resize_to)
        x = BasicConv2d(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = InceptionA(POOL_FEATURES[blk], name=blk)(x)
        x = InceptionB(name="Mixed_6a")(x)
        for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = InceptionC(C7[blk], name=blk)(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        # F.avg_pool2d(x, kernel_size=8) then flatten (metrics.py:228-229);
        # for the fixed 299 input the grid is 8x8, so this is one window
        x = nn.avg_pool(x, (8, 8), strides=(8, 8))
        acts = x.reshape(x.shape[0], -1)
        logits = nn.Dense(self.num_classes, name="fc")(acts)
        return acts, logits


class JaxInceptionExtractor:
    """Pluggable ``images_nchw -> (features, logits)`` feature_fn for
    :class:`titok_tpu.metrics.image_metrics.MetricCalculator` (the
    reference's ``MetricCalculator.forward`` device call,
    ``metrics.py:44-46``). Jitted once; accepts [-1, 1] NCHW images."""

    def __init__(self, params, resize_to: int = 299):
        import jax

        self.model = InceptionV3(resize_to=resize_to)
        self.params = params
        self._fn = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)
        )

    def __call__(self, images_nchw: np.ndarray):
        x = jnp.asarray(np.transpose(
            np.asarray(images_nchw, np.float32), (0, 2, 3, 1)
        ))
        acts, logits = self._fn(self.params, x)
        return np.asarray(acts), np.asarray(logits)


def load_inception_extractor(npz_path: str, resize_to: int = 299):
    """Load converted weights (``tools/convert_inception.py``) into a
    ready-to-use extractor."""
    flat = dict(np.load(npz_path))
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return JaxInceptionExtractor(tree, resize_to=resize_to)
