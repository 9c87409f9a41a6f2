"""TP param sharding: outputs identical to the replicated model on a
4-way model-axis mesh (XLA SPMD splits the matmuls)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util import PATCH, synthetic_videos
from titok_tpu.data.packing import pack_samples
from titok_tpu.models.titok import TiTok, TiTokModel
from titok_tpu.parallel.mesh import make_mesh
from titok_tpu.parallel.tensor_parallel import shard_params_tp, tp_spec_for


def test_spec_rules():
    from jax.tree_util import DictKey

    leaf = np.zeros((4, 4))
    assert tp_spec_for((DictKey("attn_0"), DictKey("to_qkv"), DictKey("kernel")), leaf) == \
        jax.sharding.PartitionSpec(None, "model")
    assert tp_spec_for((DictKey("attn_0"), DictKey("out_proj"), DictKey("kernel")), leaf) == \
        jax.sharding.PartitionSpec("model", None)
    assert tp_spec_for((DictKey("ln_post"), DictKey("weight")), leaf) == \
        jax.sharding.PartitionSpec()


def test_tp_matches_replicated(rng):
    mesh = make_mesh(4, axis="model")
    model = TiTokModel(
        TiTok(patch_size=PATCH, dtype=jnp.float32, attn_impl="reference"),
        seq_len=128, min_grid=(4, 8, 8), seed=0,
    )
    vids = synthetic_videos(rng, 2)
    batch = pack_samples(vids, [3, 4], seq_len=128, max_samples=4,
                         patch_size=PATCH)
    arrs = batch.device_arrays()

    expected, aux_e = model.module.apply({"params": model.params}, arrs)

    tp_params = shard_params_tp(model.params, mesh)
    # verify something actually got sharded
    qkv = tp_params["encoder"]["model_layers"]["attn_0"]["to_qkv"]["kernel"]
    assert len({s.device.id for s in qkv.addressable_shards}) == 4

    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        out, aux = jax.jit(
            lambda p, b: model.module.apply({"params": p}, b)
        )(tp_params, arrs)

    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expected, np.float32), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(aux["indices"]),
                                  np.asarray(aux_e["indices"]))


def test_tp_attention_kernel_path(rng):
    """TP THROUGH the attention op (shard_map over head groups,
    CLAUDE.md roadmap #5): head-sharded q/k/v, zero collectives inside
    attention; equals the single-device op."""
    from titok_tpu.ops.attention import segment_attention_reference
    from titok_tpu.parallel.tensor_parallel import tp_segment_attention

    mesh = make_mesh(2, axis="model")
    S, Hq, Hkv, D = 128, 4, 2, 64
    q = jnp.asarray(rng.normal(size=(S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    seg = np.zeros((S,), np.int32)
    seg[:50] = 1
    seg[50:100] = 2
    seg = jnp.asarray(seg)

    expected = segment_attention_reference(q, k, v, seg)
    out = jax.jit(
        lambda *a: tp_segment_attention(*a, mesh=mesh, impl="reference")
    )(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-5)


def test_tp_full_model_kernel_path(rng):
    """Full TiTok with tp_mesh + Megatron param sharding == replicated:
    the column-parallel qkv emits head-sharded activations consumed by the
    shard_map attention without resharding."""
    from titok_tpu.models.titok import TiTok
    from titok_tpu.parallel.tensor_parallel import tp_segment_attention  # noqa

    mesh = make_mesh(2, axis="model")
    base = TiTok(patch_size=PATCH, dtype=jnp.float32, attn_impl="reference")
    tp_model = TiTok(patch_size=PATCH, dtype=jnp.float32,
                     attn_impl="reference", tp_mesh=mesh)

    vids = synthetic_videos(rng, 2)
    batch = pack_samples(vids, [3, 4], seq_len=128, max_samples=4,
                         patch_size=PATCH)
    arrs = batch.device_arrays()
    params = base.init(jax.random.PRNGKey(0), arrs)["params"]
    expected, aux_e = base.apply({"params": params}, arrs)

    tp_params = shard_params_tp(params, mesh)
    out, aux = jax.jit(
        lambda p, b: tp_model.apply({"params": p}, b)
    )(tp_params, arrs)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expected, np.float32), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(aux["indices"]),
                                  np.asarray(aux_e["indices"]))
