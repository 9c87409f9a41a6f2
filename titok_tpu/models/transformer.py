"""Transformer core: GQA attention with sigmoid output gate, GEGLU FFN, and
the KEEL alpha-scaled residual stack.

Semantics follow reference ``model/base/transformer.py``:

- ``Attn`` (ref ``:69-104``): RMSNorm pre-norm; one fused ``to_qkv``
  projection producing q + sigmoid output gate + k + v with no biases
  (``:78,87``); RoPE on q and k (``:97-98``); varlen attention over packed
  segments (``:100``); output gated by ``sigmoid(gate)``
  (Qwen3-next-style, ``:103``); ``out_proj`` without bias.
- ``GEGLU`` (ref ``:36-56``): inner dim ``mult*(2/3)*dim`` rounded up to a
  multiple of 32; RMSNorm pre-norm; ``gelu(gate) * x`` with **exact** (erf)
  GELU (torch default); no biases.
- ``ResidualAttentionBlock`` (ref ``:107-146``): layer 0 is standard
  pre-LN residual; layers >= 1 use ``x = alpha*x + sublayer(x)`` followed by
  a post-RMSNorm with ``alpha = 2 * num_layers`` (KEEL,
  arXiv 2601.19895 as cited by the reference).

TPU-first notes: the whole stack operates on one packed ``[S, width]``
buffer; attention dispatches to the Pallas flash kernel with segment-id
masking on TPU. bf16 compute / fp32 params, norms and softmax in fp32.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from titok_tpu.models.rope import apply_rotary_emb
from titok_tpu.ops.attention import segment_attention
from titok_tpu.ops.rmsnorm import RMSNorm

# reference init: trunc_normal(std=0.02) with +-2 absolute cutoffs (= 100
# sigma, effectively untruncated), biases zero (ref utils.py:54-60)
dense_init = nn.initializers.normal(stddev=0.02)


class SplitNorm(nn.Module):
    """Per-slot-type RMSNorm weights (reference ``transformer.py:17-33``,
    arXiv 2602.08626). Present in the reference but unused on its live path
    — kept for parity; usable as a drop-in for the split pre-norms."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, token_mask):
        dim = x.shape[-1]
        w_t = self.param("weight_t", nn.initializers.ones, (1, dim), jnp.float32)
        w_p = self.param("weight_p", nn.initializers.ones, (1, dim), jnp.float32)
        xf = x.astype(jnp.float32)
        import jax

        normed = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps
        )
        w = jnp.where(token_mask[:, None], w_t, w_p)
        return (normed * w).astype(x.dtype)


class Attn(nn.Module):
    dim: int
    heads: Sequence[int]  # [q_heads, kv_heads]
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # static bound on segment length (packed-sample size); lets the flash
    # kernel compress its kv grid to visited blocks only
    max_seg_len: int | None = None
    # context parallelism: when a mesh is given, the packed [S] axis is
    # sharded along cp_axis and attention runs through the shard_map CP op
    # (q local, kv gathered over ICI); everything else in the block is
    # row-wise and partitioned by the SPMD partitioner automatically
    cp_mesh: Any = None
    cp_axis: str = "seq"
    # tensor parallelism: run the attention kernel head-parallel inside
    # shard_map over this mesh's tp_axis (composes with shard_params_tp's
    # column/row-parallel projections; with cp_mesh ALSO set — same mesh,
    # different axes — attention runs the combined seq x head shard_map)
    tp_mesh: Any = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, segment_ids):
        q_heads, kv_heads = self.heads
        head_dim = self.dim // q_heads
        gqa_dim = head_dim * kv_heads

        x = RMSNorm(name="pre_ln")(x)
        qkv = nn.Dense(
            2 * self.dim + 2 * gqa_dim, use_bias=False, name="to_qkv",
            kernel_init=dense_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        q, gate, k, v = jnp.split(
            qkv, [self.dim, 2 * self.dim, 2 * self.dim + gqa_dim], axis=-1
        )
        S = x.shape[0]
        q = q.reshape(S, q_heads, head_dim)
        k = k.reshape(S, kv_heads, head_dim)
        v = v.reshape(S, kv_heads, head_dim)

        # flash_rope fuses the rotation into the attention kernel (q/k go
        # in RAW); every other impl rotates here
        fuse_rope = self.attn_impl == "flash_rope" and self.cp_mesh is None
        if not fuse_rope:
            q = apply_rotary_emb(q, rope_cos, rope_sin)
            k = apply_rotary_emb(k, rope_cos, rope_sin)

        if self.cp_mesh is not None and self.tp_mesh is not None:
            # 3-axis composition: rows sharded along cp_axis AND heads
            # along tp_axis of the same mesh (parallel/dpcptp.py)
            from titok_tpu.parallel.context_parallel import (
                cptp_segment_attention,
            )

            o = cptp_segment_attention(
                q, k, v, segment_ids, self.cp_mesh,
                seq_axis=self.cp_axis, tp_axis=self.tp_axis,
                impl=self.attn_impl,
            )
        elif self.cp_mesh is not None:
            from titok_tpu.parallel.context_parallel import cp_segment_attention

            o = cp_segment_attention(
                q, k, v, segment_ids, self.cp_mesh, self.cp_axis,
                impl=self.attn_impl,
            )
        elif self.tp_mesh is not None:
            from titok_tpu.parallel.tensor_parallel import tp_segment_attention

            o = tp_segment_attention(
                q, k, v, segment_ids, self.tp_mesh, self.tp_axis,
                impl=self.attn_impl, max_seg_len=self.max_seg_len,
            )
        else:
            o = segment_attention(
                q, k, v, segment_ids, impl=self.attn_impl,
                max_seg_len=self.max_seg_len,
                rope_cos=rope_cos if fuse_rope else None,
                rope_sin=rope_sin if fuse_rope else None,
            )
        o = o.reshape(S, self.dim)
        o = o * nn.sigmoid(gate)
        return nn.Dense(
            self.dim, use_bias=False, name="out_proj",
            kernel_init=dense_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(o)


class GEGLU(nn.Module):
    dim: int
    mult: float = 4.0
    mult_of: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = int(self.mult * (2.0 / 3.0) * self.dim)
        inner = self.mult_of * ((inner + self.mult_of - 1) // self.mult_of)

        x = RMSNorm(name="norm")(x)
        h = nn.Dense(
            inner * 2, use_bias=False, name="w12",
            kernel_init=dense_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        h1, gate = jnp.split(h, 2, axis=-1)
        h = nn.gelu(gate, approximate=False) * h1  # exact erf GELU, ref :51
        return nn.Dense(
            self.dim, use_bias=False, name="w3",
            kernel_init=dense_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(h)


class SwiGLUFFD(nn.Module):
    """SwiGLU feed-forward (reference ``ffd_swi``, transformer.py:59-66 —
    unused on the reference's live path, which uses GEGLU; kept for parity
    as a drop-in alternative; same inner-dim rounding, biases enabled as in
    xformers SwiGLU)."""

    dim: int
    mult: float = 4.0
    mult_of: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = int(self.mult * (2.0 / 3.0) * self.dim)
        inner = self.mult_of * ((inner + self.mult_of - 1) // self.mult_of)
        x = RMSNorm(name="norm")(x)
        w1 = nn.Dense(inner, use_bias=True, name="w1", kernel_init=dense_init,
                      dtype=self.dtype, param_dtype=jnp.float32)(x)
        w2 = nn.Dense(inner, use_bias=True, name="w2", kernel_init=dense_init,
                      dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.silu(w1) * w2
        return nn.Dense(self.dim, use_bias=True, name="w3",
                        kernel_init=dense_init, dtype=self.dtype,
                        param_dtype=jnp.float32)(h)


class ResidualAttentionBlock(nn.Module):
    embed_dim: int = 512
    heads: Sequence[int] = (8, 2)
    mlp_ratio: float = 4.0
    num_layer: int = 2
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    max_seg_len: int | None = None
    # rematerialize sublayers in the backward pass (jax.checkpoint): trades
    # FLOPs for activation memory — lets big budgets/models fit HBM
    remat: bool = False
    cp_mesh: Any = None
    cp_axis: str = "seq"
    tp_mesh: Any = None
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, segment_ids):
        attn_cls, ffd_cls = Attn, GEGLU
        if self.remat:
            attn_cls = nn.remat(Attn, static_argnums=())
            ffd_cls = nn.remat(GEGLU, static_argnums=())
        alpha = jnp.asarray(self.num_layer * 2, dtype=x.dtype)
        for i in range(self.num_layer):
            attn = attn_cls(
                self.embed_dim, self.heads, dtype=self.dtype,
                attn_impl=self.attn_impl, max_seg_len=self.max_seg_len,
                cp_mesh=self.cp_mesh, cp_axis=self.cp_axis,
                tp_mesh=self.tp_mesh, tp_axis=self.tp_axis,
                name=f"attn_{i}",
            )
            ffd = ffd_cls(
                self.embed_dim, mult=self.mlp_ratio, dtype=self.dtype,
                name=f"ffd_{i}",
            )
            if i == 0:  # standard pre-LN residual (ref :128-130)
                x = x + attn(x, rope_cos, rope_sin, segment_ids)
                x = x + ffd(x)
            else:  # KEEL: alpha-scaled residual + post-LN (ref :141-145)
                x = alpha * x + attn(x, rope_cos, rope_sin, segment_ids)
                x = RMSNorm(name=f"attn_post_ln_{i - 1}")(x)
                x = alpha * x + ffd(x)
                x = RMSNorm(name=f"ffd_post_ln_{i - 1}")(x)
        return x
