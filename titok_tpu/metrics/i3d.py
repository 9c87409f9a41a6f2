"""InceptionI3d (Kinetics-400) in JAX — the FVD feature extractor,
TPU-resident.

The reference evaluates FVD with a torchscript I3D auto-downloaded from
Dropbox and pinned to ``cuda:0`` (reference ``model/metrics/fvd.py:27-37``).
That torchscript wraps the standard Kinetics InceptionI3d (Carreira &
Zisserman 2017; piergiaj/pytorch-i3d layout): Unit3D = Conv3d(no bias) +
BatchNorm + ReLU with TF-style SAME padding, nine Inception blocks, global
average pool, 1x1x1 logits conv to 400 classes. FVD uses the 400-d logits
as features.

This port is inference-only: BatchNorm is folded to a per-channel
``scale * x + offset`` (the converter bakes running stats in —
``tools/convert_i3d.py``), convs run NDHWC with ``padding='SAME'`` which IS
TF semantics, so outputs match the torch graph bit-for-bit up to float
reassociation (golden-tested against a weight-sharing torch mirror in
``tests/test_i3d.py``).

Weights must be staged locally (zero egress): convert the torchscript or a
state dict once with ``tools/convert_i3d.py`` and point
``training.eval.i3d_path`` / ``TITOK_I3D_PATH`` at the ``.npz``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (out_channels fan-out per branch) for each Mixed block, standard Kinetics
# InceptionI3d (piergiaj/pytorch-i3d InceptionI3d.__init__)
MIXED_CHANNELS = {
    "Mixed_3b": (64, (96, 128), (16, 32), 32),
    "Mixed_3c": (128, (128, 192), (32, 96), 64),
    "Mixed_4b": (192, (96, 208), (16, 48), 64),
    "Mixed_4c": (160, (112, 224), (24, 64), 64),
    "Mixed_4d": (128, (128, 256), (24, 64), 64),
    "Mixed_4e": (112, (144, 288), (32, 64), 64),
    "Mixed_4f": (256, (160, 320), (32, 128), 128),
    "Mixed_5b": (256, (160, 320), (32, 128), 128),
    "Mixed_5c": (384, (192, 384), (48, 128), 128),
}


class Unit3D(nn.Module):
    """Conv3d (no bias) + folded BatchNorm + optional ReLU."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    strides: Sequence[int] = (1, 1, 1)
    relu: bool = True
    bn: bool = True
    bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, tuple(self.kernel), strides=tuple(self.strides),
            padding="SAME", use_bias=self.bias, name="conv",
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        if self.bn:
            scale = self.param("bn_scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            offset = self.param("bn_offset", nn.initializers.zeros,
                                (self.features,), jnp.float32)
            x = x * scale + offset
        if self.relu:
            x = nn.relu(x)
        return x


def _max_pool_same(x, window, strides):
    """TF-SAME 3D max pool over NDHWC."""
    import jax.lax as lax

    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, *window, 1), (1, *strides, 1), "SAME",
    )


class InceptionBlock(nn.Module):
    ch: tuple  # (b0, (b1a, b1b), (b2a, b2b), b3)

    @nn.compact
    def __call__(self, x):
        b0, (b1a, b1b), (b2a, b2b), b3 = self.ch
        y0 = Unit3D(b0, name="b0")(x)
        y1 = Unit3D(b1a, name="b1a")(x)
        y1 = Unit3D(b1b, kernel=(3, 3, 3), name="b1b")(y1)
        y2 = Unit3D(b2a, name="b2a")(x)
        y2 = Unit3D(b2b, kernel=(3, 3, 3), name="b2b")(y2)
        y3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        y3 = Unit3D(b3, name="b3")(y3)
        return jnp.concatenate([y0, y1, y2, y3], axis=-1)


class InceptionI3d(nn.Module):
    """Input NDHWC (T, H, W ordering), values in [-1, 1] per the FVD
    convention; returns [N, num_classes] logits."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, kernel=(7, 7, 7), strides=(2, 2, 2),
                   name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, kernel=(3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionBlock(MIXED_CHANNELS["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionBlock(MIXED_CHANNELS["Mixed_3c"], name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            x = InceptionBlock(MIXED_CHANNELS[name], name=name)(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionBlock(MIXED_CHANNELS["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionBlock(MIXED_CHANNELS["Mixed_5c"], name="Mixed_5c")(x)
        # torch-faithful head (piergiaj InceptionI3d.forward): AvgPool3d
        # kernel (2, 7, 7) stride 1 VALID — overlapping temporal windows
        # weight interior frames more than a uniform mean — then the 1x1x1
        # logits conv and a mean over the remaining time axis.
        import jax.lax as lax

        tw = min(2, x.shape[1])
        sw = (min(7, x.shape[2]), min(7, x.shape[3]))
        x = lax.reduce_window(
            x, 0.0, lax.add, (1, tw, *sw, 1), (1, 1, 1, 1, 1), "VALID"
        ) / float(tw * sw[0] * sw[1])
        x = Unit3D(self.num_classes, relu=False, bn=False, bias=True,
                   name="logits")(x)
        return x.mean(axis=(1, 2, 3))


def preprocess_bcthw(video_bcthw: np.ndarray, target: int = 224,
                     min_frames: int = 10) -> np.ndarray:
    """Reference FVD preprocessing (``fvd.py:47-67``): trilinear resize to
    224² (T untouched), last-frame repeat to >= 10 frames, NDHWC output."""
    import jax
    import jax.image

    x = jnp.asarray(video_bcthw, jnp.float32)  # [B, C, T, H, W]
    b, c, t, h, w = x.shape
    if h != target or w != target:
        x = jax.image.resize(x, (b, c, t, target, target), method="trilinear")
    if t < min_frames:
        pad = jnp.repeat(x[:, :, -1:], min_frames - t, axis=2)
        x = jnp.concatenate([x, pad], axis=2)
    return jnp.transpose(x, (0, 2, 3, 4, 1))  # NDHWC


class JaxI3DExtractor:
    """FVD feature extractor running the JAX I3D (TPU-resident)."""

    def __init__(self, params: dict, num_classes: int = 400,
                 target: int = 224):
        import jax

        self.model = InceptionI3d(num_classes=num_classes)
        self.params = params
        self.target = target
        self._fwd = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)
        )

    def __call__(self, video_bcthw: np.ndarray) -> np.ndarray:
        x = preprocess_bcthw(video_bcthw, target=self.target)
        return np.asarray(self._fwd(self.params, x), np.float32)


def load_i3d_params(path: str) -> dict:
    """Load converted ``.npz`` params (keys = '/'.joined flax tree paths,
    produced by ``tools/convert_i3d.py``)."""
    data = np.load(path)
    tree: dict = {}
    for key, val in data.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree
