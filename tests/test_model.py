"""Model-level invariants: segment isolation, padding invariance, API shape.

The packed-vs-separate test is the TPU-native equivalent of validating the
reference's varlen attention masking (``blocks.py:82-86`` +
``flash_attn_varlen_func``): samples packed together must produce bit-wise
the computation they'd produce packed alone.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from titok_tpu.data.packing import pack_samples, unpack_videos
from titok_tpu.models.titok import TiTok, TiTokModel
from titok_tpu.ops.attention import segment_attention_reference

PATCH = (4, 8, 8)


def _vid(rng, t, h, w, c=3):
    return rng.normal(size=(c, t, h, w)).astype(np.float32)


@pytest.fixture(scope="module")
def model():
    mod = TiTok(patch_size=PATCH, dtype=jnp.float32, attn_impl="reference")
    return TiTokModel(mod, seq_len=256, min_grid=(4, 8, 8))


def test_segment_isolation(model, rng):
    """Outputs per sample are identical whether packed together or alone."""
    v1, v2 = _vid(rng, 8, 16, 16), _vid(rng, 4, 16, 24)
    together, _ = model.forward([v1, v2], [7, 3])
    alone1, _ = model.forward([v1], [7])
    alone2, _ = model.forward([v2], [3])
    np.testing.assert_allclose(together[0], alone1[0], atol=1e-5)
    np.testing.assert_allclose(together[1], alone2[0], atol=1e-5)


def test_padding_invariance(rng):
    """Same inputs under different budgets (pad amounts) give same outputs."""
    mod = TiTok(patch_size=PATCH, dtype=jnp.float32, attn_impl="reference")
    m_small = TiTokModel(mod, seq_len=128, min_grid=(4, 8, 8), seed=0)
    m_large = TiTokModel(mod, params=m_small.params, seq_len=320,
                         min_grid=(4, 8, 8))
    v = _vid(rng, 8, 16, 16)
    out_s, aux_s = m_small.forward([v], [5])
    out_l, aux_l = m_large.forward([v], [5])
    np.testing.assert_allclose(out_s[0], out_l[0], atol=1e-5)
    np.testing.assert_array_equal(aux_s["indices"][0], aux_l["indices"][0])


def test_encode_decode_roundtrip_api(model, rng):
    """encode -> decode_indices reproduces forward's reconstruction
    (reference public API parity, titok.py:47-66)."""
    v = _vid(rng, 8, 16, 16)
    recon, aux = model.forward([v], [6])
    idx = model.encode([v], [6])
    np.testing.assert_array_equal(idx[0], aux["indices"][0])
    assert idx[0].shape == (6,)
    assert (idx[0] >= 0).all() and (idx[0] < 4375).all()
    recon2 = model.decode_indices(idx, grids=[v.shape[1:]])
    np.testing.assert_allclose(recon2[0], recon[0], atol=1e-5)
    assert recon[0].shape == v.shape


def test_attention_segment_masking(rng):
    """Dense reference attention: cross-segment logits truly masked."""
    S, Hq, Hkv, D = 32, 4, 2, 16
    q = rng.normal(size=(S, Hq, D)).astype(np.float32)
    k = rng.normal(size=(S, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(S, Hkv, D)).astype(np.float32)
    seg = np.zeros((S,), np.int32)
    seg[:10] = 1
    seg[10:25] = 2
    out = np.asarray(segment_attention_reference(q, k, v, seg))

    # manually compute per segment (with GQA repeat)
    k_r = np.repeat(k, 2, axis=1)
    v_r = np.repeat(v, 2, axis=1)
    for lo, hi in [(0, 10), (10, 25), (25, 32)]:
        qs, ks, vs = q[lo:hi], k_r[lo:hi], v_r[lo:hi]
        logits = np.einsum("qhd,khd->hqk", qs, ks) / np.sqrt(D)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        exp = np.einsum("hqk,khd->qhd", p, vs)
        np.testing.assert_allclose(out[lo:hi], exp, atol=1e-5)


def test_gqa_grouping(rng):
    """GQA must repeat kv heads so q head g attends kv head g // rep."""
    S, D = 8, 4
    seg = np.ones((S,), np.int32)
    q = rng.normal(size=(S, 4, D)).astype(np.float32)
    k = rng.normal(size=(S, 2, D)).astype(np.float32)
    v = rng.normal(size=(S, 2, D)).astype(np.float32)
    out = np.asarray(segment_attention_reference(q, k, v, seg))
    # head 0,1 use kv head 0; heads 2,3 use kv head 1
    full_k = np.stack([k[:, 0], k[:, 0], k[:, 1], k[:, 1]], axis=1)
    full_v = np.stack([v[:, 0], v[:, 0], v[:, 1], v[:, 1]], axis=1)
    out2 = np.asarray(segment_attention_reference(q, full_k, full_v, seg))
    np.testing.assert_allclose(out, out2, atol=1e-6)


def test_deterministic_indices(model, rng):
    v = _vid(rng, 8, 16, 16)
    a = model.encode([v], [4])[0]
    b = model.encode([v], [4])[0]
    np.testing.assert_array_equal(a, b)


def test_remat_same_outputs_and_grads(rng):
    """remat=True must not change values or gradients."""
    import jax

    v = _vid(rng, 8, 16, 16)
    base = TiTok(patch_size=PATCH, dtype=jnp.float32, attn_impl="reference")
    rem = TiTok(patch_size=PATCH, dtype=jnp.float32, attn_impl="reference",
                remat=True)
    m = TiTokModel(base, seq_len=128, min_grid=(4, 8, 8), seed=0)
    from titok_tpu.data.packing import pack_samples

    batch = pack_samples([v], [4], seq_len=128, max_samples=2,
                         patch_size=PATCH).device_arrays()

    def loss(mod, params):
        recon, _ = mod.apply({"params": params}, batch)
        return (recon.astype(jnp.float32) ** 2).sum()

    l0 = float(loss(base, m.params))
    l1 = float(loss(rem, m.params))
    assert abs(l0 - l1) < 1e-3
    g0 = jax.grad(lambda p: loss(base, p))(m.params)
    g1 = jax.grad(lambda p: loss(rem, p))(m.params)
    a = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g0)])
    b = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g1)])
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_serving_auto_batching(model, rng):
    """More clips than fit one budget are split transparently."""
    vids = [_vid(rng, 8, 16, 16) for _ in range(6)]  # 6 * (32 grid + tc)
    tcs = [10] * 6  # 6 * 42 = 252 fits; use small budget model below
    small = TiTokModel(model.module, params=model.params, seq_len=96,
                       min_grid=(4, 8, 8))
    recon, aux = small.forward(vids, tcs)  # needs 3 groups under 96 budget
    assert len(recon) == 6 and all(r is not None for r in recon)
    # identical results as one-clip-at-a-time
    solo = small.forward([vids[3]], [10])[0][0]
    np.testing.assert_allclose(recon[3], solo, atol=1e-5)
    idx = small.encode(vids, tcs)
    np.testing.assert_array_equal(idx[3], small.encode([vids[3]], [10])[0])
