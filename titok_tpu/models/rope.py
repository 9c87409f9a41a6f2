"""Multi-axis rotary position embedding over packed mixed sequences.

Reference semantics (reference ``model/base/rope.py``):

- Frequencies are ``theta ** linspace(0, 1, grid_dim) * pi/2`` in float64
  (``rope.py:42-45``) — NOT the usual ``theta**(-2i/d)`` schedule.
  ``grid_dim = head_dim // (grid_dims * 2)`` (``rope.py:40``), e.g.
  64 // 6 = 10 frequencies per axis; 60 of 64 head dims are rotated, the
  remainder passes through unrotated (``rope.py:24``).
- Per sample, latent token *i* gets position id ``(i, i, i)`` and the patch
  at grid coordinate ``(t, h, w)`` gets ``(t, h, w) + token_count``
  (``rope.py:57-67``) so patches sit "after" the latent tokens on all axes.
- Interleaved layout (``rope.py:49-53``): the rotated pair *k* of a head is
  driven by frequency ``inv_freqs[k // grid_dims]`` on axis ``k % grid_dims``.
- Application is complex multiplication on (even, odd) dim pairs in fp32
  with autocast disabled (``rope.py:20-27``).

TPU-first design: position ids live in the PackedBatch (host-computed, cheap);
cos/sin tables are precomputed **once per batch in float64 on the host**
(matching torch.polar's float64 → complex64 path bit-for-bit closer than an
on-device fp32 recompute would) and shipped as fp32 ``[S, rot_dim/2]``
tensors. On device, application is a fused elementwise multiply — XLA folds
it into the surrounding QKV matmul epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_inv_freqs(head_dim: int, grid_dims: int, theta: float = 10000.0) -> np.ndarray:
    """float64 frequencies, one set shared by all axes (ref ``rope.py:40-45``)."""
    grid_dim = head_dim // (grid_dims * 2)
    return np.power(theta, np.linspace(0.0, 1.0, grid_dim, dtype=np.float64)) * np.pi / 2.0


def rope_angles(
    ids: np.ndarray, head_dim: int, grid_dims: int, theta: float = 10000.0,
    interleave: bool = True,
) -> np.ndarray:
    """Angles ``[L, grid_dim * grid_dims]`` in float64 (ref ``rope.py:49-54``).

    ``ids``: float/int ``[L, grid_dims]`` position ids.
    Interleaved: ``angles[l, f*grid_dims + a] = inv_freqs[f] * ids[l, a]``.
    """
    inv = rope_inv_freqs(head_dim, grid_dims, theta)  # [F]
    ids = np.asarray(ids, dtype=np.float64)
    if interleave:
        freqs = inv[None, :, None] * ids[:, None, :]  # [L, F, A]
    else:
        freqs = inv[None, None, :] * ids[:, :, None]  # [L, A, F]
    return freqs.reshape(ids.shape[0], -1)


def rope_cos_sin(
    ids: np.ndarray, head_dim: int, grid_dims: int, theta: float = 10000.0,
    interleave: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """fp32 cos/sin tables ``[L, rot_pairs]`` from float64 angles."""
    ang = rope_angles(ids, head_dim, grid_dims, theta, interleave)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def positions_for_sample(grid: np.ndarray, token_count: int) -> np.ndarray:
    """Per-sample position ids (ref ``rope.py:57-67``).

    ``grid``: [grid_dims] patch-grid shape. Returns
    ``[token_count + prod(grid), grid_dims]`` float32: latent token *i* at
    ``(i, ..., i)``; patch at cartesian coord ``c`` (row-major, axis 0
    slowest) at ``c + token_count``.
    """
    grid = np.asarray(grid, dtype=np.int64)
    gd = len(grid)
    token_ids = np.repeat(
        np.arange(token_count, dtype=np.float32)[:, None], gd, axis=1
    )
    coords = np.stack(
        np.meshgrid(*[np.arange(g, dtype=np.float32) for g in grid], indexing="ij"),
        axis=-1,
    ).reshape(-1, gd)
    return np.concatenate([token_ids, coords + float(token_count)], axis=0)


def apply_rotary_emb(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate ``x`` ``[L, H, D]`` by per-position tables ``[L, P]``.

    Matches reference ``rope.py:20-27``: view dims as complex pairs
    ``(x[2k], x[2k+1])``, rotate the first P pairs, pass the rest through.
    fp32 compute, cast back to input dtype.
    """
    orig_dtype = x.dtype
    L, H, D = x.shape
    P = cos.shape[-1]
    xf = x.astype(jnp.float32).reshape(L, H, D // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    c = cos[:, None, :]  # [L, 1, P]
    s = sin[:, None, :]
    out_r = xr[..., :P] * c - xi[..., :P] * s
    out_i = xr[..., :P] * s + xi[..., :P] * c
    rot = jnp.stack([out_r, out_i], axis=-1)
    rest = xf[:, :, P:, :]
    out = jnp.concatenate([rot, rest], axis=2).reshape(L, H, D)
    return out.astype(orig_dtype)
