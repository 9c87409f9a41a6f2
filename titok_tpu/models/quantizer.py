"""Finite Scalar Quantization (FSQ) — https://arxiv.org/abs/2309.15505.

Semantics match the reference quantizer (reference ``model/quantizer/fsq.py``):
tanh bound with per-level half-width and even-level offset (``fsq.py:78-83``),
straight-through rounding (``fsq.py:48-51``), renormalization to [-1, 1]
(``fsq.py:85-90``), and a mixed-radix index codec with
``basis = cumprod([1] + levels[:-1])`` (``fsq.py:66,105-121``).

The whole quantizer is an fp32 island regardless of the compute dtype
(the reference disables autocast, ``fsq.py:123-126``): FSQ's rounding
boundary must not move with bf16 noise or token IDs change between steps.

Pure-functional: no parameters, everything derived from ``levels``. All ops
are elementwise → XLA fuses this into the surrounding kernels; there is
nothing for a hand-written Pallas kernel to win here.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def round_ste(z: jnp.ndarray) -> jnp.ndarray:
    """Round with straight-through gradients (reference ``fsq.py:48-51``)."""
    zhat = jnp.round(z)  # round-half-to-even, same as torch.round
    return z + jax.lax.stop_gradient(zhat - z)


class FSQ:
    """Stateless FSQ codec over the last axis (size ``len(levels)``)."""

    def __init__(self, levels: Sequence[int]):
        self.levels_list = [int(l) for l in levels]
        self.codebook_dim = len(self.levels_list)
        self.codebook_size = int(np.prod(self.levels_list))
        # host-side constants; become XLA constants when traced
        self._levels = jnp.asarray(self.levels_list, dtype=jnp.int32)
        self._basis = jnp.asarray(
            np.cumprod([1] + self.levels_list[:-1]), dtype=jnp.int32
        )
        self._levels_f = self._levels.astype(jnp.float32)
        self._half_width = (self._levels // 2).astype(jnp.float32)

    # -- quantization ---------------------------------------------------
    def bound(self, z: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
        """Bound ``z`` (reference ``fsq.py:78-83``)."""
        half_l = (self._levels_f - 1.0) * (1.0 + eps) / 2.0
        offset = jnp.where(self._levels % 2 == 0, 0.5, 0.0).astype(jnp.float32)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """Quantize to the normalized [-1, 1] code grid (``fsq.py:85-90``)."""
        quantized = round_ste(self.bound(z))
        return quantized / self._half_width

    # -- index codec ------------------------------------------------------
    def _scale_and_shift(self, zhat_normalized: jnp.ndarray) -> jnp.ndarray:
        return (zhat_normalized * self._half_width) + self._half_width

    def _scale_and_shift_inverse(self, zhat: jnp.ndarray) -> jnp.ndarray:
        return (zhat - self._half_width) / self._half_width

    def codes_to_indices(self, zhat: jnp.ndarray) -> jnp.ndarray:
        """Normalized codes -> int32 codebook indices (``fsq.py:105-109``)."""
        z = self._scale_and_shift(zhat)
        # round to kill fp jitter before the integer dot with the basis
        zi = jnp.round(z).astype(jnp.int32)
        return jnp.sum(zi * self._basis, axis=-1).astype(jnp.int32)

    def indices_to_level_indices(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Indices -> per-level digit (``fsq.py:111-115``)."""
        idx = indices[..., None]
        return (idx // self._basis) % self._levels

    def indices_to_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Inverse of ``codes_to_indices`` (``fsq.py:117-121``)."""
        level_indices = self.indices_to_level_indices(indices).astype(jnp.float32)
        return self._scale_and_shift_inverse(level_indices)

    def implicit_codebook(self) -> np.ndarray:
        """All codebook vectors, shape [codebook_size, dim] (``fsq.py:75-76``)."""
        idx = jnp.arange(self.codebook_size, dtype=jnp.int32)
        return np.asarray(self.indices_to_codes(idx))

    # -- forward ----------------------------------------------------------
    def __call__(self, z: jnp.ndarray) -> tuple[jnp.ndarray, dict]:
        """Quantize ``[..., dim]`` latents. fp32 island (``fsq.py:123-134``).

        Returns ``(codes, {'indices': int32[...]})`` with codes cast back to
        the input dtype.
        """
        orig_dtype = z.dtype
        z = z.astype(jnp.float32)
        codes = self.quantize(z)
        indices = self.codes_to_indices(codes)
        return codes.astype(orig_dtype), {"indices": indices}
