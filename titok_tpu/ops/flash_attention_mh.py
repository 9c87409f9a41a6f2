"""Multi-head-fused Pallas flash segment attention (v2 kernel).

Same semantics as ``titok_tpu/ops/flash_attention.py`` but restructured for
the TiTok workload (few heads, head_dim 64, packed segments):

- grid is ``(q_blocks, kv_blocks)`` only; all heads are processed inside
  one block iteration as **static 64-wide column slices** of ``[S, H*D]``
  buffers. The segment mask is computed once per (q, kv) block pair and
  shared by every head (the v1 kernel recomputed it per head), k/v tiles
  are loaded once instead of per-q-head, and no ``[S,H,D] -> [H,S,D]``
  transposes are needed — inputs come straight from the fused qkv
  projection's layout.
- block skipping via scalar-prefetched per-block segment-id intervals,
  as in v1 — plus **DMA elision**: Pallas prefetches every grid step's
  blocks even under ``pl.when``, and on bandwidth-limited chips that DMA
  dominates. Segments are contiguous, so each q row's visited kv blocks
  form an interval ``[a_i, b_i]``; the kv index map clips ``j`` into that
  interval, making skipped steps re-reference the previous block, which
  Mosaic recognizes and skips the copy. kv HBM traffic drops from
  ``nq*nk`` to ``sum_i (b_i - a_i + 1)`` blocks.

Used by default on TPU; v1 remains as a reference and for odd head
configurations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from titok_tpu.ops.flash_attention import _block_minmax, _remap_pad

NEG_INF = -1e30


def _overlap_ranges(qmm: jnp.ndarray, kmm: jnp.ndarray) -> jnp.ndarray:
    """[nq, 2] int32 (first, last) kv-block index overlapping each q block.

    Segment ids are non-decreasing, so the overlapping kv blocks of a q
    block form one contiguous interval (never empty: the co-located block
    always overlaps)."""
    nq, nk = qmm.shape[0], kmm.shape[0]
    ov = (kmm[None, :, 0] <= qmm[:, None, 1]) & (kmm[None, :, 1] >= qmm[:, None, 0])
    idx = jnp.arange(nk, dtype=jnp.int32)[None, :]
    first = jnp.min(jnp.where(ov, idx, nk), axis=1).astype(jnp.int32)
    last = jnp.max(jnp.where(ov, idx, -1), axis=1).astype(jnp.int32)
    return jnp.stack([first, last], axis=1)


def _clip(j, ab, i):
    return jnp.clip(j, ab[i, 0], ab[i, 1])


def _fwd_kernel(qmm, kmm, ab, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                o_ref, lse_ref, acc, m_s, l_s, *, scale, n_k, hq, hkv, d):
    # grid dim 1 is COMPRESSED: it counts visited kv blocks [0, kmax);
    # the real kv block is ab[iq, 0] + jl (clipped in the index maps)
    jl = pl.program_id(1)
    iq = pl.program_id(0)
    kmax = pl.num_programs(1)
    rep = hq // hkv

    @pl.when(jl == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)

    overlap = ab[iq, 0] + jl <= ab[iq, 1]

    @pl.when(overlap)
    def _compute():
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)  # [Bq, Bk]
        for h in range(hq):
            hk = h // rep
            qh = q_ref[:, h * d:(h + 1) * d]
            kh = k_ref[:, hk * d:(hk + 1) * d]
            vh = v_ref[:, hk * d:(hk + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_s[:, h:h + 1]
            l_prev = l_s[:, h:h + 1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_s[:, h:h + 1] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_s[:, h:h + 1] = m_new
            acc[:, h * d:(h + 1) * d] = acc[:, h * d:(h + 1) * d] * alpha + (
                jax.lax.dot_general(
                    p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )

    @pl.when(jl == kmax - 1)
    def _finish():
        l = jnp.maximum(l_s[...], 1e-30)
        for h in range(hq):
            o_ref[:, h * d:(h + 1) * d] = (
                acc[:, h * d:(h + 1) * d] / l[:, h:h + 1]
            ).astype(o_ref.dtype)
        lse_ref[...] = m_s[...] + jnp.log(l)


# ---------------------------------------------------------------------------
# Fused-RoPE kernel variants (VERDICT r1 next #9).
#
# RoPE on q/k moves inside the kernel, eliminating the separate rotate
# passes per layer. Formulation: with host-expanded per-lane tables
#   ce[l, 2k] = ce[l, 2k+1] = cos[l, k]   (1 beyond the rotated pairs)
#   se[l, 2k] = -sin[l, k], se[l, 2k+1] = +sin[l, k]   (0 beyond)
# the rotation is   rot(x) = x * ce + swap(x) * se
# where swap exchanges even/odd lanes. swap runs as a constant 0/1
# [d, d] matrix on the MXU — exact in bf16 (single-term sums), no lane
# relayouts. Per element this computes exactly apply_rotary_emb's
# xr*c - xi*s / xr*s + xi*c, so outputs are bitwise-identical to the
# unfused path. Gradients: rotation is orthogonal, so the backward kernels
# rotate q/k the same way when recomputing p, and apply the INVERSE
# rotation (se negated) to the accumulated dq/dk.
# ---------------------------------------------------------------------------


def _swap_mat(d, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    return (c == (r ^ 1)).astype(dtype)


def _rot(xh, ce, se, inverse=False):
    """Rotate one [B, d] head slice by per-row tables [B, d]."""
    sw = jax.lax.dot_general(
        xh, _swap_mat(xh.shape[-1], xh.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xf = xh.astype(jnp.float32)
    s = -se if inverse else se
    return xf * ce + sw * s


def expand_rope_tables(cos, sin, d):
    """[S, P] cos/sin -> per-lane [S, d] (ce, se) fp32 tables."""
    S, P = cos.shape
    pairs = d // 2
    cos_p = jnp.concatenate(
        [cos.astype(jnp.float32),
         jnp.ones((S, pairs - P), jnp.float32)], axis=-1)
    sin_p = jnp.concatenate(
        [sin.astype(jnp.float32),
         jnp.zeros((S, pairs - P), jnp.float32)], axis=-1)
    ce = jnp.repeat(cos_p, 2, axis=-1)
    se = jnp.stack([-sin_p, sin_p], axis=-1).reshape(S, d)
    return ce, se


def _fwd_kernel_rope(qmm, kmm, ab, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                     ceq_ref, seq_ref, cek_ref, sek_ref,
                     o_ref, lse_ref, acc, m_s, l_s, qrot, *, scale, n_k, hq,
                     hkv, d):
    jl = pl.program_id(1)
    iq = pl.program_id(0)
    kmax = pl.num_programs(1)
    rep = hq // hkv

    @pl.when(jl == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        # rotate q ONCE per q block (kv iterations reuse the cache)
        ceq, seq_ = ceq_ref[...], seq_ref[...]
        for h in range(hq):
            qrot[:, h * d:(h + 1) * d] = _rot(
                q_ref[:, h * d:(h + 1) * d], ceq, seq_
            ).astype(qrot.dtype)

    overlap = ab[iq, 0] + jl <= ab[iq, 1]

    @pl.when(overlap)
    def _compute():
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)
        cek, sek = cek_ref[...], sek_ref[...]
        for h in range(hq):
            hk = h // rep
            qh = qrot[:, h * d:(h + 1) * d]
            kh = _rot(k_ref[:, hk * d:(hk + 1) * d], cek, sek).astype(
                k_ref.dtype)
            vh = v_ref[:, hk * d:(hk + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_s[:, h:h + 1]
            l_prev = l_s[:, h:h + 1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_s[:, h:h + 1] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_s[:, h:h + 1] = m_new
            acc[:, h * d:(h + 1) * d] = acc[:, h * d:(h + 1) * d] * alpha + (
                jax.lax.dot_general(
                    p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )

    @pl.when(jl == kmax - 1)
    def _finish():
        l = jnp.maximum(l_s[...], 1e-30)
        for h in range(hq):
            o_ref[:, h * d:(h + 1) * d] = (
                acc[:, h * d:(h + 1) * d] / l[:, h:h + 1]
            ).astype(o_ref.dtype)
        lse_ref[...] = m_s[...] + jnp.log(l)


def _bwd_dq_kernel_rope(qmm, kmm, ab, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                        ceq_ref, seq_ref, cek_ref, sek_ref,
                        do_ref, lse_ref, delta_ref, dq_ref, dq_acc, qrot,
                        *, scale, n_k, hq, hkv, d):
    jl = pl.program_id(1)
    iq = pl.program_id(0)
    kmax = pl.num_programs(1)
    rep = hq // hkv

    @pl.when(jl == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        ceq, seq_ = ceq_ref[...], seq_ref[...]
        for h in range(hq):
            qrot[:, h * d:(h + 1) * d] = _rot(
                q_ref[:, h * d:(h + 1) * d], ceq, seq_
            ).astype(qrot.dtype)

    overlap = ab[iq, 0] + jl <= ab[iq, 1]

    @pl.when(overlap)
    def _compute():
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)
        cek, sek = cek_ref[...], sek_ref[...]
        for h in range(hq):
            hk = h // rep
            qh = qrot[:, h * d:(h + 1) * d]
            kh = _rot(k_ref[:, hk * d:(hk + 1) * d], cek, sek).astype(
                k_ref.dtype)
            vh = v_ref[:, hk * d:(hk + 1) * d]
            doh = do_ref[:, h * d:(h + 1) * d]
            lse = lse_ref[:, h:h + 1]
            delta = delta_ref[:, h:h + 1]

            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta) * scale
            # accumulates the gradient w.r.t. the ROTATED q
            dq_acc[:, h * d:(h + 1) * d] += jax.lax.dot_general(
                ds.astype(kh.dtype), kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(jl == kmax - 1)
    def _finish():
        # inverse rotation back to raw-q space (R^T = rotation by -theta)
        ceq, seq_ = ceq_ref[...], seq_ref[...]
        for h in range(hq):
            dq_ref[:, h * d:(h + 1) * d] = _rot(
                dq_acc[:, h * d:(h + 1) * d], ceq, seq_, inverse=True
            ).astype(dq_ref.dtype)


def _bwd_dkv_kernel_rope(qmm, kmm, ab, q_ref, k_ref, v_ref, segq_ref,
                         segk_ref, ceq_ref, seq_ref, cek_ref, sek_ref,
                         do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                         dk_acc, dv_acc, krot, *, scale, n_q, hq, hkv, d):
    jl = pl.program_id(1)
    ik = pl.program_id(0)
    kmax = pl.num_programs(1)
    rep = hq // hkv

    @pl.when(jl == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)
        cek, sek = cek_ref[...], sek_ref[...]
        for hk in range(hkv):
            krot[:, hk * d:(hk + 1) * d] = _rot(
                k_ref[:, hk * d:(hk + 1) * d], cek, sek
            ).astype(krot.dtype)

    overlap = ab[ik, 0] + jl <= ab[ik, 1]

    @pl.when(overlap)
    def _compute():
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)
        ceq, seq_ = ceq_ref[...], seq_ref[...]
        for h in range(hq):
            hk = h // rep
            qh = _rot(q_ref[:, h * d:(h + 1) * d], ceq, seq_).astype(
                q_ref.dtype)
            kh = krot[:, hk * d:(hk + 1) * d]
            vh = v_ref[:, hk * d:(hk + 1) * d]
            doh = do_ref[:, h * d:(h + 1) * d]
            lse = lse_ref[:, h:h + 1]
            delta = delta_ref[:, h:h + 1]

            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)

            dv_acc[:, hk * d:(hk + 1) * d] += jax.lax.dot_general(
                p.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - delta) * scale).astype(qh.dtype)
            dk_acc[:, hk * d:(hk + 1) * d] += jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(jl == kmax - 1)
    def _finish():
        cek, sek = cek_ref[...], sek_ref[...]
        for hk in range(hkv):
            dk_ref[:, hk * d:(hk + 1) * d] = _rot(
                dk_acc[:, hk * d:(hk + 1) * d], cek, sek, inverse=True
            ).astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _mh_fwd(q2, k2, v2, seg_q, seg_k, scale, block_q, block_k, hq, hkv, d,
            max_kv_blocks):
    S = q2.shape[0]
    Sk = k2.shape[0]
    nq, nk = S // block_q, Sk // block_k
    segq2 = seg_q.reshape(S, 1)
    segk2 = seg_k.reshape(Sk, 1)
    qmm = _block_minmax(seg_q, block_q)
    kmm = _block_minmax(seg_k, block_k)
    ab = _overlap_ranges(qmm, kmm)
    kmax = min(nk, max_kv_blocks) if max_kv_blocks else nk

    # COMPRESSED grid: dim 1 iterates only the visited kv interval
    # [a_i, min(a_i + kmax, b_i)]; the index map offsets + clips, so no
    # skipped block is ever iterated or DMA'd
    kv_ix = lambda i, j, qmm_r, kmm_r, ab_r: (_clip(ab_r[i, 0] + j, ab_r, i), 0)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_k=nk, hq=hq, hkv=hkv, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nq, kmax),
            in_specs=[
                pl.BlockSpec((block_q, hq * d), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_k, hkv * d), kv_ix),
                pl.BlockSpec((block_k, hkv * d), kv_ix),
                pl.BlockSpec((block_q, 1), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_k, 1), kv_ix),
            ],
            out_specs=[
                pl.BlockSpec((block_q, hq * d), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_q, hq), lambda i, j, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, hq * d), jnp.float32),
                pltpu.VMEM((block_q, hq), jnp.float32),
                pltpu.VMEM((block_q, hq), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((S, hq * d), q2.dtype),
            jax.ShapeDtypeStruct((S, hq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qmm, kmm, ab, q2, k2, v2, segq2, segk2)
    return out, lse


def _bwd_dq_kernel(qmm, kmm, ab, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                   do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
                   *, scale, n_k, hq, hkv, d):
    jl = pl.program_id(1)
    iq = pl.program_id(0)
    kmax = pl.num_programs(1)
    rep = hq // hkv

    @pl.when(jl == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    overlap = ab[iq, 0] + jl <= ab[iq, 1]

    @pl.when(overlap)
    def _compute():
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)
        for h in range(hq):
            hk = h // rep
            qh = q_ref[:, h * d:(h + 1) * d]
            kh = k_ref[:, hk * d:(hk + 1) * d]
            vh = v_ref[:, hk * d:(hk + 1) * d]
            doh = do_ref[:, h * d:(h + 1) * d]
            lse = lse_ref[:, h:h + 1]
            delta = delta_ref[:, h:h + 1]

            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta) * scale
            dq_acc[:, h * d:(h + 1) * d] += jax.lax.dot_general(
                ds.astype(kh.dtype), kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(jl == kmax - 1)
    def _finish():
        dq_ref[...] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(qmm, kmm, ab, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                    do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                    dk_acc, dv_acc, *, scale, n_q, hq, hkv, d):
    jl = pl.program_id(1)
    ik = pl.program_id(0)
    kmax = pl.num_programs(1)
    rep = hq // hkv

    @pl.when(jl == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    overlap = ab[ik, 0] + jl <= ab[ik, 1]

    @pl.when(overlap)
    def _compute():
        mask = segq_ref[...] == segk_ref[...].reshape(1, -1)
        for h in range(hq):
            hk = h // rep
            qh = q_ref[:, h * d:(h + 1) * d]
            kh = k_ref[:, hk * d:(hk + 1) * d]
            vh = v_ref[:, hk * d:(hk + 1) * d]
            doh = do_ref[:, h * d:(h + 1) * d]
            lse = lse_ref[:, h:h + 1]
            delta = delta_ref[:, h:h + 1]

            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # [Bq, Bk]

            dv_acc[:, hk * d:(hk + 1) * d] += jax.lax.dot_general(
                p.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - delta) * scale).astype(qh.dtype)
            dk_acc[:, hk * d:(hk + 1) * d] += jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(jl == kmax - 1)
    def _finish():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _mh_bwd(res, g, scale, block_q, block_k, hq, hkv, d, max_kv_blocks):
    q2, k2, v2, seg_q, seg_k, out, lse = res
    S = q2.shape[0]
    Sk = k2.shape[0]
    nq, nk = S // block_q, Sk // block_k
    segq2 = seg_q.reshape(S, 1)
    segk2 = seg_k.reshape(Sk, 1)
    qmm = _block_minmax(seg_q, block_q)
    kmm = _block_minmax(seg_k, block_k)

    do2 = g
    # delta[s, h] = sum_d do[s, h*d:(h+1)d] * out[s, ...]
    delta = (
        (do2.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(S, hq, d).sum(-1)
    )  # [S, hq]

    ab = _overlap_ranges(qmm, kmm)
    kmax_k = min(nk, max_kv_blocks) if max_kv_blocks else nk
    kv_ix = lambda i, j, qmm_r, kmm_r, ab_r: (_clip(ab_r[i, 0] + j, ab_r, i), 0)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, n_k=nk, hq=hq,
                          hkv=hkv, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nq, kmax_k),
            in_specs=[
                pl.BlockSpec((block_q, hq * d), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_k, hkv * d), kv_ix),
                pl.BlockSpec((block_k, hkv * d), kv_ix),
                pl.BlockSpec((block_q, 1), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_k, 1), kv_ix),
                pl.BlockSpec((block_q, hq * d), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_q, hq), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_q, hq), lambda i, j, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((block_q, hq * d), lambda i, j, *_: (i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, hq * d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((S, hq * d), q2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qmm, kmm, ab, q2, k2, v2, segq2, segk2, do2, lse, delta)

    ab2 = _overlap_ranges(kmm, qmm)  # per kv row: visited q-block interval
    # q blocks per kv block bounded by the same segment-length bound scaled
    # by the block ratio (+2 boundary slop)
    if max_kv_blocks:
        kmax_q = min(nq, max(1, max_kv_blocks * block_k // block_q + 2))
    else:
        kmax_q = nq
    q_ix = lambda i, j, qmm_r, kmm_r, ab_r: (_clip(ab_r[i, 0] + j, ab_r, i), 0)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, n_q=nq, hq=hq,
                          hkv=hkv, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nk, kmax_q),
            in_specs=[
                pl.BlockSpec((block_q, hq * d), q_ix),
                pl.BlockSpec((block_k, hkv * d), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_k, hkv * d), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_q, 1), q_ix),
                pl.BlockSpec((block_k, 1), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_q, hq * d), q_ix),
                pl.BlockSpec((block_q, hq), lambda i, j, qmm_r, kmm_r, ab_r: (_clip(ab_r[i, 0] + j, ab_r, i), 0)),
                pl.BlockSpec((block_q, hq), lambda i, j, qmm_r, kmm_r, ab_r: (_clip(ab_r[i, 0] + j, ab_r, i), 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_k, hkv * d), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((block_k, hkv * d), lambda i, j, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, hkv * d), jnp.float32),
                pltpu.VMEM((block_k, hkv * d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Sk, hkv * d), q2.dtype),
            jax.ShapeDtypeStruct((Sk, hkv * d), q2.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qmm, kmm, ab2, q2, k2, v2, segq2, segk2, do2, lse, delta)

    return dq, dk, dv, None, None


def _rope_fwd(q2, k2, v2, seg_q, seg_k, ceq, seq_, cek, sek, scale, block_q,
              block_k, hq, hkv, d, max_kv_blocks):
    S = q2.shape[0]
    Sk = k2.shape[0]
    nq, nk = S // block_q, Sk // block_k
    segq2 = seg_q.reshape(S, 1)
    segk2 = seg_k.reshape(Sk, 1)
    qmm = _block_minmax(seg_q, block_q)
    kmm = _block_minmax(seg_k, block_k)
    ab = _overlap_ranges(qmm, kmm)
    kmax = min(nk, max_kv_blocks) if max_kv_blocks else nk
    kv_ix = lambda i, j, qmm_r, kmm_r, ab_r: (_clip(ab_r[i, 0] + j, ab_r, i), 0)
    q_row = lambda i, j, *_: (i, 0)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_rope, scale=scale, n_k=nk, hq=hq,
                          hkv=hkv, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nq, kmax),
            in_specs=[
                pl.BlockSpec((block_q, hq * d), q_row),
                pl.BlockSpec((block_k, hkv * d), kv_ix),
                pl.BlockSpec((block_k, hkv * d), kv_ix),
                pl.BlockSpec((block_q, 1), q_row),
                pl.BlockSpec((block_k, 1), kv_ix),
                pl.BlockSpec((block_q, d), q_row),
                pl.BlockSpec((block_q, d), q_row),
                pl.BlockSpec((block_k, d), kv_ix),
                pl.BlockSpec((block_k, d), kv_ix),
            ],
            out_specs=[
                pl.BlockSpec((block_q, hq * d), q_row),
                pl.BlockSpec((block_q, hq), q_row),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, hq * d), jnp.float32),
                pltpu.VMEM((block_q, hq), jnp.float32),
                pltpu.VMEM((block_q, hq), jnp.float32),
                pltpu.VMEM((block_q, hq * d), q2.dtype),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((S, hq * d), q2.dtype),
            jax.ShapeDtypeStruct((S, hq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qmm, kmm, ab, q2, k2, v2, segq2, segk2, ceq, seq_, cek, sek)
    return out, lse


def _rope_bwd(res, g, scale, block_q, block_k, hq, hkv, d, max_kv_blocks):
    q2, k2, v2, seg_q, seg_k, ceq, seq_, cek, sek, out, lse = res
    S = q2.shape[0]
    Sk = k2.shape[0]
    nq, nk = S // block_q, Sk // block_k
    segq2 = seg_q.reshape(S, 1)
    segk2 = seg_k.reshape(Sk, 1)
    qmm = _block_minmax(seg_q, block_q)
    kmm = _block_minmax(seg_k, block_k)

    do2 = g
    delta = (
        (do2.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(S, hq, d).sum(-1)
    )

    ab = _overlap_ranges(qmm, kmm)
    kmax_k = min(nk, max_kv_blocks) if max_kv_blocks else nk
    kv_ix = lambda i, j, qmm_r, kmm_r, ab_r: (_clip(ab_r[i, 0] + j, ab_r, i), 0)
    q_row = lambda i, j, *_: (i, 0)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_rope, scale=scale, n_k=nk, hq=hq,
                          hkv=hkv, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nq, kmax_k),
            in_specs=[
                pl.BlockSpec((block_q, hq * d), q_row),
                pl.BlockSpec((block_k, hkv * d), kv_ix),
                pl.BlockSpec((block_k, hkv * d), kv_ix),
                pl.BlockSpec((block_q, 1), q_row),
                pl.BlockSpec((block_k, 1), kv_ix),
                pl.BlockSpec((block_q, d), q_row),
                pl.BlockSpec((block_q, d), q_row),
                pl.BlockSpec((block_k, d), kv_ix),
                pl.BlockSpec((block_k, d), kv_ix),
                pl.BlockSpec((block_q, hq * d), q_row),
                pl.BlockSpec((block_q, hq), q_row),
                pl.BlockSpec((block_q, hq), q_row),
            ],
            out_specs=pl.BlockSpec((block_q, hq * d), q_row),
            scratch_shapes=[
                pltpu.VMEM((block_q, hq * d), jnp.float32),
                pltpu.VMEM((block_q, hq * d), q2.dtype),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((S, hq * d), q2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qmm, kmm, ab, q2, k2, v2, segq2, segk2, ceq, seq_, cek, sek, do2, lse,
      delta)

    ab2 = _overlap_ranges(kmm, qmm)
    if max_kv_blocks:
        kmax_q = min(nq, max(1, max_kv_blocks * block_k // block_q + 2))
    else:
        kmax_q = nq
    q_ix = lambda i, j, qmm_r, kmm_r, ab_r: (_clip(ab_r[i, 0] + j, ab_r, i), 0)
    k_row = lambda i, j, *_: (i, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_rope, scale=scale, n_q=nq, hq=hq,
                          hkv=hkv, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nk, kmax_q),
            in_specs=[
                pl.BlockSpec((block_q, hq * d), q_ix),
                pl.BlockSpec((block_k, hkv * d), k_row),
                pl.BlockSpec((block_k, hkv * d), k_row),
                pl.BlockSpec((block_q, 1), q_ix),
                pl.BlockSpec((block_k, 1), k_row),
                pl.BlockSpec((block_q, d), q_ix),
                pl.BlockSpec((block_q, d), q_ix),
                pl.BlockSpec((block_k, d), k_row),
                pl.BlockSpec((block_k, d), k_row),
                pl.BlockSpec((block_q, hq * d), q_ix),
                pl.BlockSpec((block_q, hq), q_ix),
                pl.BlockSpec((block_q, hq), q_ix),
            ],
            out_specs=[
                pl.BlockSpec((block_k, hkv * d), k_row),
                pl.BlockSpec((block_k, hkv * d), k_row),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, hkv * d), jnp.float32),
                pltpu.VMEM((block_k, hkv * d), jnp.float32),
                pltpu.VMEM((block_k, hkv * d), q2.dtype),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Sk, hkv * d), q2.dtype),
            jax.ShapeDtypeStruct((Sk, hkv * d), q2.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qmm, kmm, ab2, q2, k2, v2, segq2, segk2, ceq, seq_, cek, sek, do2, lse,
      delta)

    return (dq, dk, dv, None, None,
            jnp.zeros_like(ceq), jnp.zeros_like(seq_),
            jnp.zeros_like(cek), jnp.zeros_like(sek))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14, 15))
def _mh_rope(q2, k2, v2, seg_q, seg_k, ceq, seq_, cek, sek, scale, block_q,
             block_k, hq, hkv, d, max_kv_blocks):
    out, _ = _rope_fwd(q2, k2, v2, seg_q, seg_k, ceq, seq_, cek, sek, scale,
                       block_q, block_k, hq, hkv, d, max_kv_blocks)
    return out


def _mh_rope_vjp_fwd(q2, k2, v2, seg_q, seg_k, ceq, seq_, cek, sek, scale,
                     block_q, block_k, hq, hkv, d, max_kv_blocks):
    out, lse = _rope_fwd(q2, k2, v2, seg_q, seg_k, ceq, seq_, cek, sek, scale,
                         block_q, block_k, hq, hkv, d, max_kv_blocks)
    return out, (q2, k2, v2, seg_q, seg_k, ceq, seq_, cek, sek, out, lse)


def _mh_rope_vjp_bwd(scale, block_q, block_k, hq, hkv, d, max_kv_blocks, res,
                     g):
    return _rope_bwd(res, g, scale, block_q, block_k, hq, hkv, d,
                     max_kv_blocks)


_mh_rope.defvjp(_mh_rope_vjp_fwd, _mh_rope_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _mh(q2, k2, v2, seg_q, seg_k, scale, block_q, block_k, hq, hkv, d,
        max_kv_blocks):
    out, _ = _mh_fwd(q2, k2, v2, seg_q, seg_k, scale, block_q, block_k, hq,
                     hkv, d, max_kv_blocks)
    return out


def _mh_vjp_fwd(q2, k2, v2, seg_q, seg_k, scale, block_q, block_k, hq, hkv, d,
                max_kv_blocks):
    out, lse = _mh_fwd(q2, k2, v2, seg_q, seg_k, scale, block_q, block_k, hq,
                       hkv, d, max_kv_blocks)
    return out, (q2, k2, v2, seg_q, seg_k, out, lse)


def _mh_vjp_bwd(scale, block_q, block_k, hq, hkv, d, max_kv_blocks, res, g):
    return _mh_bwd(res, g, scale, block_q, block_k, hq, hkv, d, max_kv_blocks)


_mh.defvjp(_mh_vjp_fwd, _mh_vjp_bwd)


def _choose_blocks(S: int, Sk: int, block_q: int, block_k: int,
                   hq: int) -> tuple[int, int]:
    """Pick (bq, bk): requested sizes, rounded down to the sequence
    lengths, then capped by the scoped-VMEM budget. The bwd kernels
    unroll the head loop with one (bq, bk) f32 temporary alive per head,
    and Mosaic's scoped-vmem stack is capped at 16 MB; measured on v5e,
    12 heads @ 512x512 compiles while 16 heads @ 512x512 overflows by
    2.8 MB ("Ran out of memory in memory space vmem ... on stack"). Cap
    hq*bq*bk at the known-safe 12*512*512 elements, shrinking the larger
    block first."""
    def _pow2_block(n, b):
        return min(b, max(8, 1 << (n - 1).bit_length()))

    bq = _pow2_block(S, block_q)
    bk = _pow2_block(Sk, block_k)
    while hq * bq * bk > 12 * 512 * 512 and max(bq, bk) > 128:
        if bq >= bk:
            bq //= 2
        else:
            bk //= 2
    return bq, bk


def flash_segment_attention_mh(
    q: jnp.ndarray,  # [Sq, Hq, D]
    k: jnp.ndarray,  # [Sk, Hkv, D]
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,       # int32 [Sq] — MUST be non-decreasing
                                    # (0 = pad, may only appear at the end)
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    k_segment_ids: jnp.ndarray | None = None,  # int32 [Sk] (defaults to q's)
    max_seg_len: int | None = None,
    rope_cos: jnp.ndarray | None = None,       # f32 [Sq, P]: fuse RoPE for q
    rope_sin: jnp.ndarray | None = None,
    k_rope_cos: jnp.ndarray | None = None,     # [Sk, P] (defaults to q's)
    k_rope_sin: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``max_seg_len``: static upper bound on any segment's length (the
    packer guarantees samples fit the budget; configs know
    prod(max_grid/patch) + max token count). When given, the kv grid
    dimension is compressed to ceil(max_seg_len/block)+1 visited blocks per
    row — skipped blocks are never iterated. Segments longer than the bound
    would be silently truncated, so pass a true bound."""
    S, Hq, D = q.shape
    Sk = k.shape[0]
    Hkv = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    seg_q = _remap_pad(segment_ids)
    seg_k = seg_q if k_segment_ids is None else _remap_pad(k_segment_ids)

    # pad to block multiples (padding rows get a dedicated huge segment id
    # one above the pad remap so they never attend to real rows)
    def _pad_to(x, n, fill=0):
        if x.shape[0] == n:
            return x
        widths = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    bq, bk = _choose_blocks(S, Sk, block_q, block_k, Hq)
    Sp = -(-S // bq) * bq
    Skp = -(-Sk // bk) * bk
    big2 = 2**30 + 1
    q2 = _pad_to(q.reshape(S, Hq * D), Sp)
    k2 = _pad_to(k.reshape(Sk, Hkv * D), Skp)
    v2 = _pad_to(v.reshape(Sk, Hkv * D), Skp)
    seg_q = _pad_to(seg_q, Sp, fill=big2)
    seg_k = _pad_to(seg_k, Skp, fill=big2)

    max_kv_blocks = None
    if max_seg_len is not None:
        # a segment of length L covers at most ceil(L/bk)+1 kv blocks; +1
        # more for the co-located block slop at both interval ends
        max_kv_blocks = -(-int(max_seg_len) // bk) + 2

    if rope_cos is not None:
        ceq, seq_ = expand_rope_tables(rope_cos, rope_sin, D)
        if k_rope_cos is None:
            cek, sek = ceq, seq_
        else:
            cek, sek = expand_rope_tables(k_rope_cos, k_rope_sin, D)
        # pad rows rotate by identity (ce=1, se=0)
        ceq = _pad_to(ceq, Sp, fill=1.0)
        seq_ = _pad_to(seq_, Sp, fill=0.0)
        cek = _pad_to(cek, Skp, fill=1.0)
        sek = _pad_to(sek, Skp, fill=0.0)
        out = _mh_rope(q2, k2, v2, seg_q, seg_k, ceq, seq_, cek, sek,
                       float(scale), bq, bk, Hq, Hkv, D, max_kv_blocks)
        return out[:S].reshape(S, Hq, D)

    out = _mh(q2, k2, v2, seg_q, seg_k, float(scale), bq, bk, Hq, Hkv, D,
              max_kv_blocks)
    return out[:S].reshape(S, Hq, D)
