"""Context-parallel transformer block: the packed buffer sharded along S
(4-way 'seq' mesh), row-wise ops partitioned by jit, attention via the CP
op — must equal the single-device block. This is the integration pattern
for seq-sharded training (CLAUDE.md roadmap #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.util import PATCH, synthetic_videos
from titok_tpu.data.packing import pack_samples
from titok_tpu.models.rope import apply_rotary_emb
from titok_tpu.models.transformer import Attn
from titok_tpu.ops.attention import segment_attention_reference
from titok_tpu.parallel.context_parallel import cp_segment_attention
from titok_tpu.parallel.mesh import make_mesh


def test_cp_block_matches_single_device(rng):
    mesh = make_mesh(4, axis="seq")
    S, dim = 256, 256
    vids = synthetic_videos(rng, 3)
    batch = pack_samples(vids, [5, 9, 3], seq_len=S, max_samples=8,
                         patch_size=PATCH)
    arrs = batch.device_arrays()

    attn = Attn(dim=dim, heads=(4, 2), dtype=jnp.float32, attn_impl="reference")
    x = jnp.asarray(rng.normal(size=(S, dim)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, arrs["rope_cos"],
                       arrs["rope_sin"], arrs["segment_ids"])["params"]

    expected = attn.apply({"params": params}, x, arrs["rope_cos"],
                          arrs["rope_sin"], arrs["segment_ids"])

    # CP path: qkv/gate/out_proj are row-wise (jit partitions them along S);
    # only the attention core goes through the shard_map CP op.
    def cp_attn_block(p, x, cos, sin, seg):
        from titok_tpu.models.rope import apply_rotary_emb
        from titok_tpu.ops.rmsnorm import rms_norm

        h = rms_norm(x, p["pre_ln"]["weight"])
        qkv = h @ p["to_qkv"]["kernel"]
        q, gate, k, v = jnp.split(qkv, [dim, 2 * dim, 2 * dim + 128], axis=-1)
        q = apply_rotary_emb(q.reshape(S, 4, 64), cos, sin)
        k = apply_rotary_emb(k.reshape(S, 2, 64), cos, sin)
        v = v.reshape(S, 2, 64)
        o = cp_segment_attention(q, k, v, seg, mesh, "seq", impl="reference")
        o = o.reshape(S, dim) * jax.nn.sigmoid(gate)
        return o @ p["out_proj"]["kernel"]

    shard = NamedSharding(mesh, P("seq"))
    repl = NamedSharding(mesh, P())
    x_s = jax.device_put(x, shard)
    cos_s = jax.device_put(jnp.asarray(arrs["rope_cos"]), shard)
    sin_s = jax.device_put(jnp.asarray(arrs["rope_sin"]), shard)
    seg_s = jax.device_put(jnp.asarray(arrs["segment_ids"]), shard)
    p_r = jax.device_put(params, repl)

    out = jax.jit(cp_attn_block)(p_r, x_s, cos_s, sin_s, seg_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-4, rtol=1e-3)
    # output stays sharded along seq (no implicit gather)
    assert len({s.device.id for s in out.addressable_shards}) == 4
