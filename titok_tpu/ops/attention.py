"""Segment-masked (block-diagonal) attention over packed sequences.

This is the TPU-native replacement for the reference's
``flash_attn_varlen_func(q, k, v, cu_seqlens)`` (reference
``model/base/transformer.py:100``): packed samples become *segments* in one
fixed-size buffer, and the block-diagonal varlen mask becomes a
``segment_ids[i] == segment_ids[j]`` predicate.

Two implementations:

- :func:`segment_attention_reference` — dense masked attention in pure XLA.
  O(S²) memory; used as the ground truth in tests and as the fallback on
  CPU / for short sequences.
- :func:`titok_tpu.ops.flash_attention.flash_segment_attention` — a Pallas
  flash-attention kernel with segment-id masking and block skipping
  (O(S) memory, MXU-tiled). Selected automatically on TPU.

Both handle GQA (q_heads a multiple of kv_heads) and use fp32 softmax with
bf16 matmul inputs, matching flash-attn's numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _flash_available() -> bool:
    try:
        from titok_tpu.ops.flash_attention import flash_segment_attention  # noqa: F401

        return True
    except ImportError:
        return False


def segment_attention_reference(
    q: jnp.ndarray,  # [S, Hq, D]
    k: jnp.ndarray,  # [S, Hkv, D]
    v: jnp.ndarray,  # [S, Hkv, D]
    segment_ids: jnp.ndarray,  # int32 [S]
    scale: float | None = None,
) -> jnp.ndarray:
    """Dense masked attention. Returns [S, Hq, D] in q.dtype."""
    S, Hq, D = q.shape
    Hkv = k.shape[1]
    assert Hq % Hkv == 0
    rep = Hq // Hkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    if scale is None:
        scale = D ** -0.5

    logits = jnp.einsum(
        "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    mask = segment_ids[:, None] == segment_ids[None, :]  # [S, S]
    logits = jnp.where(mask[None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "hqk,khd->qhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def segment_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,
    scale: float | None = None,
    impl: str = "auto",
    max_seg_len: int | None = None,
    rope_cos: jnp.ndarray | None = None,
    rope_sin: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dispatching entry point used by the transformer.

    ``impl``: 'auto' (Pallas flash on TPU, dense elsewhere), 'flash'
    (multi-head-fused v2 kernel), 'flash_rope' (v2 with RoPE fused
    in-kernel — pass UNROTATED q/k plus ``rope_cos/rope_sin``),
    'flash_v1' (head-per-grid-row kernel), or 'reference'.
    """
    if impl == "auto":
        if jax.default_backend() == "tpu" and _flash_available():
            # mh (v2): hardware-validated bitwise vs v1; supports the
            # compressed kv grid via max_seg_len
            impl = "flash"
        else:
            impl = "reference"
    if impl == "flash_rope":
        from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

        assert rope_cos is not None, "flash_rope needs rope tables"
        return flash_segment_attention_mh(
            q, k, v, segment_ids, scale=scale, max_seg_len=max_seg_len,
            rope_cos=rope_cos, rope_sin=rope_sin,
        )
    if impl == "flash":
        from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

        return flash_segment_attention_mh(q, k, v, segment_ids, scale=scale,
                                          max_seg_len=max_seg_len)
    if impl == "flash_v1":
        from titok_tpu.ops.flash_attention import flash_segment_attention

        return flash_segment_attention(q, k, v, segment_ids, scale=scale)
    return segment_attention_reference(q, k, v, segment_ids, scale)
