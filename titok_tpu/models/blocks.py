"""Packed ViT encoder/decoder (reference ``model/base/blocks.py``).

The reference packs a *list* of CTHW clips plus per-sample latent-token
slots into one flat varlen sequence with per-sample layout
``[token_slots..., patch_slots...]`` (ref ``blocks.py:82-97``). Here the
packing already happened on the host (see ``titok_tpu/data/packing.py``);
the modules consume the fixed-shape PackedBatch buffers directly, so the
whole forward is one static-shape XLA program:

- per-sample gathers like the reference's ``x[mask]`` (``blocks.py:101``)
  become masked row-wise computation: output heads are evaluated at *every*
  slot (cheap, keeps shapes static) and downstream consumers select via
  ``token_mask`` / ``segment_ids``.
- the shared **scalar** mask token (``nn.Parameter(1,1)`` expanded to width,
  ``blocks.py:50,96``) is reproduced exactly: a single learned scalar.

Encoder (ref ``blocks.py:31-104``): patchify → ``proj_in`` → split
pre-norms ``ln_pre_t``/``ln_pre_p`` per slot type → transformer →
``ln_post`` → ``proj_out`` to ``token_size`` channels, valid at token slots.

Decoder (ref ``blocks.py:108-177``): quantized codes at token slots →
``proj_in`` + mask token → transformer → ``ln_post`` → ``proj_out`` to
``C*prod(patch)``, valid at patch slots; host unpatchifies per sample.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from titok_tpu.models.transformer import ResidualAttentionBlock, dense_init
from titok_tpu.ops.patchify import decode_rows
from titok_tpu.ops.rmsnorm import RMSNorm

MODEL_DIMS = {
    # model_size: (layers, (q_heads, kv_heads)); width = 64 * q_heads
    # (reference model/base/utils.py:8-23)
    "tiny": (4, (4, 2)),
    "small": (8, (8, 2)),
    "base": (12, (12, 4)),
    "large": (24, (16, 4)),
}
HEAD_DIM = 64


def get_model_dims(model_size: str = "tiny", head_dim: int = HEAD_DIM,
                   mlp_ratio: float = 4.0):
    """width, layers, heads, mlp_ratio (reference ``utils.py:8-23``)."""
    layers, heads = MODEL_DIMS[model_size]
    return head_dim * heads[0], layers, heads, mlp_ratio


def _mask_token_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        import jax

        return scale * jax.random.normal(key, shape, dtype)

    return init


class PackedEncoder(nn.Module):
    """ViT encoder over a PackedBatch. Returns ``[S, out_channels]``
    (valid at token slots)."""

    model_size: str = "tiny"
    patch_size: Sequence[int] = (4, 8, 8)
    in_channels: int = 3
    out_channels: int = 5
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    remat: bool = False
    max_seg_len: int | None = None
    cp_mesh: Any = None
    cp_axis: str = "seq"
    tp_mesh: Any = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, patches, token_mask, segment_ids, rope_cos, rope_sin):
        width, num_layers, heads, mlp_ratio = get_model_dims(self.model_size)
        scale = width ** -0.5

        # decode_rows: uint8 wire rows normalize to [-1,1] here (on device,
        # fused into proj_in by XLA); float rows just cast
        x_p = nn.Dense(
            width, name="proj_in", kernel_init=dense_init,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(decode_rows(patches, self.dtype))

        mask_token = self.param(
            "mask_token", _mask_token_init(scale), (1, 1), jnp.float32
        )
        mt = mask_token.astype(self.dtype)  # scalar, broadcasts to width
        tok_row = RMSNorm(name="ln_pre_t")(
            jnp.broadcast_to(mt, (1, width))
        )  # [1, width]
        x_pat = RMSNorm(name="ln_pre_p")(x_p + mt)
        x = jnp.where(token_mask[:, None], tok_row, x_pat)

        x = ResidualAttentionBlock(
            embed_dim=width, heads=heads, mlp_ratio=mlp_ratio,
            num_layer=num_layers, dtype=self.dtype, attn_impl=self.attn_impl,
            max_seg_len=self.max_seg_len, remat=self.remat,
            cp_mesh=self.cp_mesh, cp_axis=self.cp_axis,
            tp_mesh=self.tp_mesh, tp_axis=self.tp_axis,
            name="model_layers",
        )(x, rope_cos, rope_sin, segment_ids)

        x = RMSNorm(name="ln_post")(x)
        return nn.Dense(
            self.out_channels, use_bias=True, name="proj_out",
            kernel_init=dense_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)


class PackedDecoder(nn.Module):
    """ViT decoder over a PackedBatch. Takes ``[S, token_size]`` codes
    (valid at token slots) and returns ``[S, out_channels*prod(patch)]``
    patch pixels (valid at patch slots)."""

    model_size: str = "tiny"
    patch_size: Sequence[int] = (4, 8, 8)
    in_channels: int = 5  # token_size
    out_channels: int = 3
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    remat: bool = False
    max_seg_len: int | None = None
    cp_mesh: Any = None
    cp_axis: str = "seq"
    tp_mesh: Any = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, tokens, token_mask, segment_ids, rope_cos, rope_sin):
        width, num_layers, heads, mlp_ratio = get_model_dims(self.model_size)
        scale = width ** -0.5

        t = nn.Dense(
            width, use_bias=True, name="proj_in", kernel_init=dense_init,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(tokens.astype(self.dtype))

        mask_token = self.param(
            "mask_token", _mask_token_init(scale), (1, 1), jnp.float32
        )
        mt = mask_token.astype(self.dtype)
        tok_rows = RMSNorm(name="ln_pre_t")(t + mt)
        pat_row = RMSNorm(name="ln_pre_p")(jnp.broadcast_to(mt, (1, width)))
        x = jnp.where(token_mask[:, None], tok_rows, pat_row)

        x = ResidualAttentionBlock(
            embed_dim=width, heads=heads, mlp_ratio=mlp_ratio,
            num_layer=num_layers, dtype=self.dtype, attn_impl=self.attn_impl,
            max_seg_len=self.max_seg_len, remat=self.remat,
            cp_mesh=self.cp_mesh, cp_axis=self.cp_axis,
            tp_mesh=self.tp_mesh, tp_axis=self.tp_axis,
            name="model_layers",
        )(x, rope_cos, rope_sin, segment_ids)

        x = RMSNorm(name="ln_post")(x)
        return nn.Dense(
            self.out_channels * math.prod(self.patch_size), name="proj_out",
            kernel_init=dense_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
