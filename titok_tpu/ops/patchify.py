"""N-D patchify/unpatchify (reference ``model/base/utils.py:26-51``).

Reference layout: ``c (d0 p0) (d1 p1) (d2 p2) -> (d0 d1 d2) (p0 p1 p2 c)``
— patch-grid coordinates row-major (axis 0 slowest) along the sequence dim,
and within a patch the channel axis is **fastest** (innermost).

These run on the host (numpy) in the data pipeline for target pixels and on
device (jnp) inside jit for reconstruction. Both are pure reshapes +
transposes, so XLA compiles the device path to a layout change fused into
neighbors.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _module_for(x):
    import jax.numpy as jnp

    return np if isinstance(x, np.ndarray) else jnp


def patchify_thwc_u8(video: np.ndarray, patch_size: Sequence[int]) -> np.ndarray:
    """Patchify a uint8 ``[T, H, W, C]`` clip WITHOUT normalizing:
    ``[prod(dims/p), prod(p)*C]`` rows in the exact layout of
    :func:`patchify` (grid row-major, channel fastest). This is the uint8
    wire format — raw pixel bytes ship to the device and
    :func:`decode_rows` normalizes there, quartering H2D volume vs f32
    (halving vs bf16) host buffers. Host side it is a pure byte shuffle
    (no float math), so it also beats the fused C++ normalize+patchify
    kernel on CPU time."""
    assert video.dtype == np.uint8 and video.ndim == 4, (video.dtype, video.shape)
    t, h, w, c = video.shape
    pt, ph, pw = patch_size
    gt, gh, gw = t // pt, h // ph, w // pw
    x = video.reshape(gt, pt, gh, ph, gw, pw, c)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)  # [gt, gh, gw, pt, ph, pw, c]
    return np.ascontiguousarray(x).reshape(gt * gh * gw, pt * ph * pw * c)


# the uint8 wire's [-1,1] mapping; matches native/packer.cpp's
# `x * (2.0f/255.0f) - 1.0f` bit-for-bit in f32
_U8_SCALE = np.float32(2.0 / 255.0)


def decode_rows(rows, dtype=None):
    """Decode wire-format patch rows to [-1,1] float. uint8 wire rows are
    normalized (in f32, then cast); float rows are already normalized and
    only cast. Every consumer of ``batch['patches']`` goes through this,
    host (numpy) and device (jnp) alike."""
    if rows.dtype == np.uint8:
        out = rows.astype(np.float32) * _U8_SCALE - np.float32(1.0)
        return out if dtype in (None, np.float32) else out.astype(dtype)
    return rows if dtype is None else rows.astype(dtype)


def patchify(video, patch_size: Sequence[int]):
    """``[C, *dims] -> [prod(dims/p), prod(p)*C]`` per the reference pattern."""
    xp = _module_for(video)
    c = video.shape[0]
    dims = video.shape[1:]
    n = len(patch_size)
    assert len(dims) == n, (dims, patch_size)
    grid = [d // p for d, p in zip(dims, patch_size)]
    # c, (g0 p0), (g1 p1), ... -> split
    shape = [c]
    for g, p in zip(grid, patch_size):
        shape += [g, p]
    x = video.reshape(shape)
    # axes: [c, g0, p0, g1, p1, ...] -> [g0, g1, ..., p0, p1, ..., c]
    g_axes = [1 + 2 * i for i in range(n)]
    p_axes = [2 + 2 * i for i in range(n)]
    x = xp.transpose(x, g_axes + p_axes + [0])
    return x.reshape(int(np.prod(grid)), int(np.prod(patch_size)) * c)


def unpatchify(patches, grid: Sequence[int], patch_size: Sequence[int], channels: int = 3):
    """Inverse of :func:`patchify`: ``[prod(grid), prod(p)*C] -> [C, *dims]``."""
    xp = _module_for(patches)
    n = len(patch_size)
    grid = [int(g) for g in grid]
    shape = grid + list(patch_size) + [channels]
    x = patches.reshape(shape)
    # axes: [g0.., p0.., c] -> [c, g0, p0, g1, p1, ...]
    perm = [2 * n]
    for i in range(n):
        perm += [i, n + i]
    x = xp.transpose(x, perm)
    dims = [g * p for g, p in zip(grid, patch_size)]
    return x.reshape([channels] + dims)
