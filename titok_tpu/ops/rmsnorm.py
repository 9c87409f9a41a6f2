"""RMSNorm with fp32 statistics (replacement for the reference's Triton
``flash_attn.ops.triton.layer_norm.RMSNorm``, reference ``transformer.py:5``).

On TPU there is nothing to hand-fuse here: XLA fuses the normalize +
scale into the neighboring matmul prologue. We only pin the numerics:
statistics in fp32, output cast back to the compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


class RMSNorm(nn.Module):
    """Root-mean-square layer norm, weight-only (no bias)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return rms_norm(x, weight, self.eps)
