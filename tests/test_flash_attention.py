"""Pallas flash segment attention vs dense reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from titok_tpu.ops.attention import segment_attention_reference
from titok_tpu.ops.flash_attention import flash_segment_attention


def _inputs(rng, S=256, Hq=4, Hkv=2, D=64, dtype=np.float32, segs=(100, 60, 40)):
    q = rng.normal(size=(S, Hq, D)).astype(dtype)
    k = rng.normal(size=(S, Hkv, D)).astype(dtype)
    v = rng.normal(size=(S, Hkv, D)).astype(dtype)
    seg = np.zeros((S,), np.int32)
    off = 0
    for i, n in enumerate(segs):
        seg[off : off + n] = i + 1
        off += n
    return q, k, v, seg


def _flash(q, k, v, seg, block=128):
    with pltpu.force_tpu_interpret_mode():
        return flash_segment_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
            block_q=block, block_k=block,
        )


def test_forward_matches_dense(rng):
    q, k, v, seg = _inputs(rng)
    out = np.asarray(_flash(q, k, v, seg))
    exp = np.asarray(segment_attention_reference(q, k, v, seg))
    np.testing.assert_allclose(out, exp, atol=2e-5)


def test_forward_single_segment(rng):
    q, k, v, seg = _inputs(rng, segs=(256,))
    out = np.asarray(_flash(q, k, v, seg))
    exp = np.asarray(segment_attention_reference(q, k, v, seg))
    np.testing.assert_allclose(out, exp, atol=2e-5)


def test_forward_many_small_segments(rng):
    q, k, v, seg = _inputs(rng, segs=tuple([16] * 12))  # 64 pad slots
    out = np.asarray(_flash(q, k, v, seg))
    exp = np.asarray(segment_attention_reference(q, k, v, seg))
    np.testing.assert_allclose(out, exp, atol=2e-5)


def test_forward_bf16(rng):
    q, k, v, seg = _inputs(rng)
    qb = jnp.asarray(q, jnp.bfloat16)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    out = np.asarray(_flash(qb, kb, vb, seg), np.float32)
    exp = np.asarray(
        segment_attention_reference(qb, kb, vb, jnp.asarray(seg)), np.float32
    )
    np.testing.assert_allclose(out, exp, atol=3e-2, rtol=3e-2)


def test_gradients_match_dense(rng):
    q, k, v, seg = _inputs(rng, S=128, segs=(50, 40))

    def loss_flash(q, k, v):
        o = flash_segment_attention(q, k, v, jnp.asarray(seg),
                                    block_q=64, block_k=64)
        return (o.astype(jnp.float32) ** 2).sum()

    def loss_dense(q, k, v):
        o = segment_attention_reference(q, k, v, jnp.asarray(seg))
        return (o.astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
        )
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
        ), name


def test_block_skipping_does_not_change_result(rng):
    """Different block sizes (=> different skip patterns) same answer."""
    q, k, v, seg = _inputs(rng)
    a = np.asarray(_flash(q, k, v, seg, block=128))
    b = np.asarray(_flash(q, k, v, seg, block=64))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_mh_kernel_matches_dense(rng):
    from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

    q, k, v, seg = _inputs(rng)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_segment_attention_mh(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
            block_q=128, block_k=128,
        ))
    exp = np.asarray(segment_attention_reference(q, k, v, seg))
    np.testing.assert_allclose(out, exp, atol=2e-5)


def test_mh_gradients_match_dense(rng):
    from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

    q, k, v, seg = _inputs(rng, S=128, segs=(50, 40))

    def loss_mh(q, k, v):
        o = flash_segment_attention_mh(q, k, v, jnp.asarray(seg),
                                       block_q=64, block_k=64)
        return (o.astype(jnp.float32) ** 2).sum()

    def loss_dense(q, k, v):
        o = segment_attention_reference(q, k, v, jnp.asarray(seg))
        return (o.astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_mh, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
        )
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_non_divisible_length_padding(rng):
    """Wrappers pad lengths that don't divide the block size (e.g. the
    disc batch's S + 4*Bmax)."""
    from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

    q, k, v, seg = _inputs(rng, S=300, segs=(120, 100, 50))
    exp = np.asarray(segment_attention_reference(q, k, v, seg))
    with pltpu.force_tpu_interpret_mode():
        out_v1 = np.asarray(flash_segment_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
            block_q=128, block_k=128))
        out_mh = np.asarray(flash_segment_attention_mh(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
            block_q=128, block_k=128))
    np.testing.assert_allclose(out_v1, exp, atol=2e-5)
    np.testing.assert_allclose(out_mh, exp, atol=2e-5)


def test_compressed_grid_matches_dense(rng):
    """max_seg_len grid compression: same results, fewer iterations."""
    from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

    q, k, v, seg = _inputs(rng, S=512, segs=tuple([60] * 8))
    exp = np.asarray(segment_attention_reference(q, k, v, seg))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_segment_attention_mh(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
            block_q=64, block_k=64, max_seg_len=64,
        ))
    np.testing.assert_allclose(out, exp, atol=2e-5)

    def loss(q, k, v):
        o = flash_segment_attention_mh(q, k, v, jnp.asarray(seg),
                                       block_q=64, block_k=64, max_seg_len=64)
        return (o.astype(jnp.float32) ** 2).sum()

    def loss_dense(q, k, v):
        o = segment_attention_reference(q, k, v, jnp.asarray(seg))
        return (o.astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def _rope_tables(rng, S, P=30):
    ang = rng.uniform(0, 2 * np.pi, size=(S, P))
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def test_fused_rope_matches_unfused_forward(rng):
    """flash_rope(q_raw, k_raw, tables) == flash(rot(q), rot(k)) up to FMA
    contraction (VERDICT r1 next #9): the in-kernel rotation computes the
    same per-element ops; XLA's fused multiply-adds reorder the last-bit
    rounding between the two graphs."""
    from titok_tpu.models.rope import apply_rotary_emb
    from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

    S, Hq, Hkv, D = 256, 4, 2, 64
    q = jnp.asarray(rng.normal(size=(S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    seg = np.zeros((S,), np.int32)
    seg[:100] = 1
    seg[100:230] = 2
    seg = jnp.asarray(seg)
    cos, sin = _rope_tables(rng, S)

    with pltpu.force_tpu_interpret_mode():
        q_r = apply_rotary_emb(q, cos, sin)
        k_r = apply_rotary_emb(k, cos, sin)
        expected = flash_segment_attention_mh(q_r, k_r, v, seg, block_q=64,
                                              block_k=64)
        fused = flash_segment_attention_mh(q, k, v, seg, block_q=64,
                                           block_k=64, rope_cos=cos,
                                           rope_sin=sin)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expected),
                               atol=1e-6, rtol=3e-6)


def test_fused_rope_gradients(rng):
    """d/dq, d/dk, d/dv of the fused kernel == grads of the unfused chain
    (rotation is orthogonal; the bwd kernels invert it)."""
    from titok_tpu.models.rope import apply_rotary_emb
    from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

    S, Hq, Hkv, D = 128, 4, 2, 64
    q = jnp.asarray(rng.normal(size=(S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    seg = np.zeros((S,), np.int32)
    seg[:60] = 1
    seg[60:120] = 2
    seg = jnp.asarray(seg)
    cos, sin = _rope_tables(rng, S)
    w = jnp.asarray(rng.normal(size=(S, Hq, D)), jnp.float32)

    def loss_fused(q, k, v):
        o = flash_segment_attention_mh(q, k, v, seg, block_q=64, block_k=64,
                                       rope_cos=cos, rope_sin=sin)
        return (o * w).sum()

    def loss_unfused(q, k, v):
        o = flash_segment_attention_mh(
            apply_rotary_emb(q, cos, sin), apply_rotary_emb(k, cos, sin), v,
            seg, block_q=64, block_k=64)
        return (o * w).sum()

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gu = jax.grad(loss_unfused, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gu, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-4, err_msg=name)


def test_fused_rope_in_model(rng):
    """attn_impl=flash_rope through the full TiTok forward == reference."""
    from tests.util import PATCH, synthetic_videos, tiny_config
    from titok_tpu.data.packing import pack_samples
    from titok_tpu.models.titok import make_titok

    cfg_ref = tiny_config()
    cfg_fused = tiny_config(**{"training.main.attn_impl": "flash_rope"})
    batch = pack_samples(synthetic_videos(np.random.default_rng(0), 3),
                         [2, 5, 3], seq_len=128, max_samples=8,
                         patch_size=PATCH)
    m_ref = make_titok(cfg_ref)
    m_fused = make_titok(cfg_fused)
    params = m_ref.init(jax.random.PRNGKey(0), batch.device_arrays())["params"]
    rec_ref, aux_ref = m_ref.apply({"params": params}, batch.device_arrays())
    with pltpu.force_tpu_interpret_mode():
        rec_f, aux_f = m_fused.apply({"params": params}, batch.device_arrays())
    np.testing.assert_allclose(np.asarray(rec_f), np.asarray(rec_ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(aux_f["indices"]),
                                  np.asarray(aux_ref["indices"]))


def test_choose_blocks_scoped_vmem_cap():
    """Large head counts shrink blocks to fit Mosaic's 16 MB scoped-vmem
    stack (the bwd kernels keep one (bq, bk) f32 temporary per unrolled
    head: 16 heads @ 512x512 overflowed on v5e, 12 heads compiled)."""
    from titok_tpu.ops.flash_attention_mh import _choose_blocks

    # known-good shapes keep the requested blocks
    assert _choose_blocks(6144, 6144, 512, 512, 4) == (512, 512)
    assert _choose_blocks(6144, 6144, 512, 512, 12) == (512, 512)
    # large (16 q heads) must shrink below the measured overflow point
    bq, bk = _choose_blocks(25088, 25088, 512, 512, 16)
    assert 16 * bq * bk <= 12 * 512 * 512
    assert bq >= 128 and bk >= 128
    # small sequences still round blocks down to the array size
    assert _choose_blocks(128, 128, 512, 512, 16) == (128, 128)


def test_mh_large_head_count_matches_dense(rng):
    """16 q heads with default 512 blocks exercises the scoped-vmem
    shrink path end-to-end (fwd + grads vs dense reference)."""
    from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

    q, k, v, seg = _inputs(rng, S=512, Hq=16, Hkv=4, segs=(300, 150, 62))
    exp = np.asarray(segment_attention_reference(q, k, v, seg))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_segment_attention_mh(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg)))
    np.testing.assert_allclose(out, exp, atol=2e-5)

    w = jnp.asarray(rng.normal(size=exp.shape).astype(np.float32))

    def loss_mh(q, k, v):
        o = flash_segment_attention_mh(q, k, v, jnp.asarray(seg))
        return (o.astype(jnp.float32) * w).sum()

    def loss_dense(q, k, v):
        o = segment_attention_reference(q, k, v, jnp.asarray(seg))
        return (o.astype(jnp.float32) * w).sum()

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_mh, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3, err_msg=name)
