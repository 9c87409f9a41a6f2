"""Context-parallel attention == single-device attention on the global
packed buffer (4-way seq sharding on the virtual CPU mesh), including a
sample that spans the shard boundary."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from titok_tpu.ops.attention import segment_attention_reference
from titok_tpu.parallel.context_parallel import cp_segment_attention
from titok_tpu.parallel.mesh import make_mesh


def test_cp_matches_single_device(rng):
    S, Hq, Hkv, D = 256, 4, 2, 16
    q = rng.normal(size=(S, Hq, D)).astype(np.float32)
    k = rng.normal(size=(S, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(S, Hkv, D)).astype(np.float32)
    # segments chosen so sample 2 SPANS the shard boundary at 64 and 128
    seg = np.zeros((S,), np.int32)
    seg[:50] = 1
    seg[50:140] = 2   # crosses shards 0→1→2
    seg[140:230] = 3
    expected = np.asarray(segment_attention_reference(q, k, v, seg))

    mesh = make_mesh(4, axis="seq")
    out = np.asarray(cp_segment_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
        mesh, axis="seq", impl="reference",
    ))
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_cp_gradients(rng):
    S, Hq, Hkv, D = 128, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    seg = np.zeros((S,), np.int32)
    seg[:100] = 1
    seg = jnp.asarray(seg)
    mesh = make_mesh(4, axis="seq")

    def loss_cp(q, k, v):
        o = cp_segment_attention(q, k, v, seg, mesh, "seq", impl="reference")
        return (o**2).sum()

    def loss_single(q, k, v):
        return (segment_attention_reference(q, k, v, seg) ** 2).sum()

    g_cp = jax.grad(loss_cp, argnums=(0, 1, 2))(q, k, v)
    g_s = jax.grad(loss_single, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_cp, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
