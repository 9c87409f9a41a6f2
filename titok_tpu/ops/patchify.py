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
