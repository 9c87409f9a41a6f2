"""Pallas TPU flash attention with segment-id (block-diagonal) masking.

The TPU-native replacement for the reference's CUDA
``flash_attn_varlen_func(q, k, v, cu_seqlens)`` (reference
``model/base/transformer.py:100``): packed samples are *segments* of one
``[S, H, D]`` buffer; positions attend iff their segment ids match. O(S)
memory (no S×S materialization), MXU-tiled, online softmax in fp32 with
bf16 matmul inputs — flash-attn numerics.

Performance structure:

- grid ``(heads, q_blocks, kv_blocks)``, kv innermost with VMEM
  accumulator scratch (classic TPU flash layout);
- **block skipping**: segment ids are non-decreasing after the pad remap,
  so each block covers an id interval. Per-block [min, max] intervals are
  precomputed on device and scalar-prefetched into SMEM; non-overlapping
  (q_block, kv_block) pairs skip all compute. For the packed-clip workload
  (many ~0.5k-token samples in a 6k buffer) this removes ~85% of blocks —
  the same win varlen flash attention gets from ``cu_seqlens``.
- GQA native: kv blocks are indexed by ``q_head // group_size`` in the
  BlockSpec index map; no repeated k/v in HBM.

Backward is a custom VJP (dq kernel + dkv kernel) using the saved
logsumexp, with the same block skipping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 512
NEG_INF = -1e30


def _pick_block(S: int) -> int:
    """Power-of-two block <= DEFAULT_BLOCK; callers pad S up to a multiple."""
    return min(DEFAULT_BLOCK, max(8, 1 << (S - 1).bit_length()))


def _block_minmax(seg: jnp.ndarray, block: int) -> jnp.ndarray:
    """[n_blocks, 2] int32 (min, max) per block of a [S] id vector."""
    n = seg.shape[0] // block
    s = seg.reshape(n, block)
    return jnp.stack([s.min(axis=1), s.max(axis=1)], axis=1).astype(jnp.int32)


def _remap_pad(segment_ids: jnp.ndarray) -> jnp.ndarray:
    """Pad slots (id 0) sit after all samples; remap them above every real
    id so the sequence of ids is non-decreasing and intervals stay tight."""
    big = jnp.int32(2**30)
    return jnp.where(segment_ids == 0, big, segment_ids.astype(jnp.int32))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(qmm, kmm, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                o_ref, lse_ref, acc, m_s, l_s, *, scale, n_k):
    ik = pl.program_id(2)
    iq = pl.program_id(1)

    @pl.when(ik == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)

    overlap = jnp.logical_and(
        kmm[ik, 0] <= qmm[iq, 1], kmm[ik, 1] >= qmm[iq, 0]
    )

    @pl.when(overlap)
    def _compute():
        q = q_ref[0]  # [Bq, D]
        k = k_ref[0]  # [Bk, D]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Bq, Bk]
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)  # [Bq,1]==[1,Bk]
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_s[...]  # [Bq, 1]
        l_prev = l_s[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_s[...] = m_new
        acc[...] = acc[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == n_k - 1)
    def _finish():
        l = jnp.maximum(l_s[...], 1e-30)
        o_ref[0] = (acc[...] / l).astype(o_ref.dtype)
        lse_ref[0] = (m_s[...] + jnp.log(l)).reshape(1, -1).astype(jnp.float32)


def _flash_fwd(q, k, v, seg, scale, block_q, block_k):
    S, Hq, D = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    nq, nk = S // block_q, S // block_k

    # head-major [H, S, D]: TPU block shapes live in the last two dims
    qh = jnp.transpose(q, (1, 0, 2))
    kh = jnp.transpose(k, (1, 0, 2))
    vh = jnp.transpose(v, (1, 0, 2))

    seg2 = seg.reshape(S, 1)
    qmm = _block_minmax(seg, block_q)
    kmm = _block_minmax(seg, block_k)

    grid = (Hq, nq, nk)
    kernel = functools.partial(_fwd_kernel, scale=scale, n_k=nk)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, i, j, *_refs: (h, i, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, i, j, *_refs: (h // rep, j, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, i, j, *_refs: (h // rep, j, 0)),
                pl.BlockSpec((block_q, 1), lambda h, i, j, *_refs: (i, 0)),
                pl.BlockSpec((block_k, 1), lambda h, i, j, *_refs: (j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, i, j, *_refs: (h, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda h, i, j, *_refs: (h, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Hq, S, D), q.dtype),
            jax.ShapeDtypeStruct((Hq, 1, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qmm, kmm, qh, kh, vh, seg2, seg2)
    return jnp.transpose(out, (1, 0, 2)), lse  # lse: [Hq, 1, S]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(qmm, kmm, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                   do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
                   *, scale, n_k):
    ik = pl.program_id(2)
    iq = pl.program_id(1)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    overlap = jnp.logical_and(
        kmm[ik, 0] <= qmm[iq, 1], kmm[ik, 1] >= qmm[iq, 0]
    )

    @pl.when(overlap)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0].reshape(-1, 1)  # [Bq, 1]
        delta = delta_ref[0, 0].reshape(-1, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == n_k - 1)
    def _finish():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(qmm, kmm, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                    do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                    dk_acc, dv_acc, *, scale, n_q):
    iq = pl.program_id(2)
    ik = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    overlap = jnp.logical_and(
        kmm[ik, 0] <= qmm[iq, 1], kmm[ik, 1] >= qmm[iq, 0]
    )

    @pl.when(overlap)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0].reshape(-1, 1)
        delta = delta_ref[0, 0].reshape(-1, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Bq, Bk]
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)

        dv_acc[...] += jax.lax.dot_general(
            p.astype(do_ref.dtype).T, do_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)  # [Bq, Bk]
        dk_acc[...] += jax.lax.dot_general(
            ds.T, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd(res, g, scale, block_q, block_k):
    q, k, v, seg, out, lse = res
    S, Hq, D = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    nq, nk = S // block_q, S // block_k

    delta = jnp.einsum(
        "shd,shd->hs", g.astype(jnp.float32), out.astype(jnp.float32)
    )[:, None, :]  # [Hq, 1, S]

    qh = jnp.transpose(q, (1, 0, 2))
    kh = jnp.transpose(k, (1, 0, 2))
    vh = jnp.transpose(v, (1, 0, 2))
    doh = jnp.transpose(g, (1, 0, 2))

    seg2 = seg.reshape(S, 1)
    qmm = _block_minmax(seg, block_q)
    kmm = _block_minmax(seg, block_k)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, n_k=nk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Hq, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, i, j, *_refs: (h, i, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, i, j, *_refs: (h // rep, j, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, i, j, *_refs: (h // rep, j, 0)),
                pl.BlockSpec((block_q, 1), lambda h, i, j, *_refs: (i, 0)),
                pl.BlockSpec((block_k, 1), lambda h, i, j, *_refs: (j, 0)),
                pl.BlockSpec((1, block_q, D), lambda h, i, j, *_refs: (h, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda h, i, j, *_refs: (h, 0, i)),
                pl.BlockSpec((1, 1, block_q), lambda h, i, j, *_refs: (h, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda h, i, j, *_refs: (h, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Hq, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qmm, kmm, qh, kh, vh, seg2, seg2, doh, lse, delta)

    # dk/dv per q head, then summed over each GQA group
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, n_q=nq),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Hq, nk, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, i, j, *_refs: (h, j, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, i, j, *_refs: (h // rep, i, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, i, j, *_refs: (h // rep, i, 0)),
                pl.BlockSpec((block_q, 1), lambda h, i, j, *_refs: (j, 0)),
                pl.BlockSpec((block_k, 1), lambda h, i, j, *_refs: (i, 0)),
                pl.BlockSpec((1, block_q, D), lambda h, i, j, *_refs: (h, j, 0)),
                pl.BlockSpec((1, 1, block_q), lambda h, i, j, *_refs: (h, 0, j)),
                pl.BlockSpec((1, 1, block_q), lambda h, i, j, *_refs: (h, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, D), lambda h, i, j, *_refs: (h, i, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, i, j, *_refs: (h, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Hq, S, D), q.dtype),
            jax.ShapeDtypeStruct((Hq, S, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qmm, kmm, qh, kh, vh, seg2, seg2, doh, lse, delta)

    dq_out = jnp.transpose(dq, (1, 0, 2))
    # [Hq, S, D] -> sum over each GQA group -> [S, Hkv, D]
    dk = jnp.transpose(
        dk_h.reshape(Hkv, rep, S, D).sum(axis=1), (1, 0, 2)
    ).astype(k.dtype)
    dv = jnp.transpose(
        dv_h.reshape(Hkv, rep, S, D).sum(axis=1), (1, 0, 2)
    ).astype(v.dtype)
    return dq_out, dk, dv, None


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, seg, scale, block_q, block_k):
    out, _ = _flash_fwd(q, k, v, seg, scale, block_q, block_k)
    return out


def _flash_vjp_fwd(q, k, v, seg, scale, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, seg, scale, block_q, block_k)
    return out, (q, k, v, seg, out, lse)


def _flash_vjp_bwd(scale, block_q, block_k, res, g):
    return _flash_bwd(res, g, scale, block_q, block_k)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_segment_attention(
    q: jnp.ndarray,  # [S, Hq, D]
    k: jnp.ndarray,  # [S, Hkv, D]
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,  # int32 [S]
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
) -> jnp.ndarray:
    S, Hq, D = q.shape
    if scale is None:
        scale = D ** -0.5
    bq = block_q or _pick_block(S)
    bk = block_k or _pick_block(S)
    seg = _remap_pad(segment_ids)
    Sp = -(-S // bq) * bq
    Sp = -(-Sp // bk) * bk  # multiple of both blocks
    if Sp != S:
        pad = Sp - S
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        seg = jnp.pad(seg, ((0, pad),), constant_values=2**30 + 1)
    out = _flash(q, k, v, seg, float(scale), bq, bk)
    return out[:S]
