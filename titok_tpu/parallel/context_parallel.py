"""Context (sequence) parallelism: packed-axis sharding over the mesh.

The reference has no distributed sequence parallelism (SURVEY.md §2.3) —
its single-device analog is sequence packing. Here the packed ``[S, ...]``
axis can additionally be sharded across a ``seq`` mesh axis so one *giant*
sample (or one giant budget) spans chips:

- q stays local per chip (each chip owns S/n rows);
- k/v (small: ``[S, Hkv, D]``) are all-gathered over ICI inside
  ``shard_map`` — cheap relative to attention FLOPs because kv is
  ``Hkv/Hq`` of q traffic and gathered once per layer;
- local segment ids are offset per shard so ids stay globally unique, then
  the local flash kernel runs with distinct q/k segment-id vectors.
  Block skipping makes each chip touch only kv blocks whose segments
  intersect its rows, so for samples fully local to a chip **zero extra
  FLOPs** are spent — CP degrades gracefully into DP.

This is the attention op; the rest of the transformer is row-wise and
shards trivially along S under the same spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_cp_attention(q, k, v, seg, axis, impl):
    """Runs inside shard_map: per-shard q, gathered k/v.

    ``seg`` must hold **global** sample ids (the global packed buffer is one
    batch, so ids are already unique across shards; a sample spanning a
    shard boundary keeps its id and attends across chips through the
    gathered kv). Pad id 0 is shared — pad rows attend pad rows, outputs
    are dropped downstream."""
    seg_g = seg

    kg = jax.lax.all_gather(k, axis, tiled=True)          # [S_total, Hkv, D]
    vg = jax.lax.all_gather(v, axis, tiled=True)
    seg_kg = jax.lax.all_gather(seg_g, axis, tiled=True)  # [S_total]

    if impl == "flash":
        from titok_tpu.ops.flash_attention_mh import flash_segment_attention_mh

        return flash_segment_attention_mh(
            q, kg, vg, seg_g, k_segment_ids=seg_kg
        )
    # dense reference path (tests / CPU)
    Sq = q.shape[0]
    St = kg.shape[0]
    rep = q.shape[1] // kg.shape[1]
    kr = jnp.repeat(kg, rep, axis=1)
    vr = jnp.repeat(vg, rep, axis=1)
    logits = jnp.einsum("qhd,khd->hqk", q, kr,
                        preferred_element_type=jnp.float32) * (q.shape[-1] ** -0.5)
    mask = seg_g[:, None] == seg_kg[None, :]
    logits = jnp.where(mask[None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs.astype(vr.dtype), vr,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def cptp_segment_attention(
    q: jnp.ndarray,        # [S_global, Hq, D] sharded (seq_axis, tp_axis)
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,  # [S_global] sharded (seq_axis,)
    mesh: Mesh,
    seq_axis: str = "seq",
    tp_axis: str = "model",
    impl: str = "auto",
) -> jnp.ndarray:
    """Sequence x head sharded segment attention over two mesh axes.

    Composition of :func:`cp_segment_attention` (rows sharded, kv gathered
    over the ``seq`` ring) with head-parallel TP
    (``tensor_parallel.tp_segment_attention``): each chip owns an
    ``[S/n_seq, Hq/n_tp, D]`` q tile, all-gathers its *local head group's*
    kv over the ``seq`` ring only, and runs the flash kernel locally. The
    two parallelisms don't interact: softmax is per-head (TP needs no
    collectives) and the kv gather is per-ring (CP's only collective), so
    the local body is exactly the CP one — only the shard_map specs differ.
    Used by the 3-axis [data, seq, model] trainer (``parallel/dpcptp.py``);
    the reference has neither (it is single-device, SURVEY.md §2.3).
    """
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "reference"
    if impl == "flash_rope":  # rotation happens before the kv gather
        impl = "flash"
    n_tp = mesh.shape[tp_axis]
    assert q.shape[1] % n_tp == 0 and k.shape[1] % n_tp == 0, (
        f"q heads {q.shape[1]} and kv heads {k.shape[1]} must divide the "
        f"{tp_axis!r} mesh axis ({n_tp})"
    )
    fn = jax.shard_map(
        functools.partial(_local_cp_attention, axis=seq_axis, impl=impl),
        mesh=mesh,
        in_specs=(P(seq_axis, tp_axis), P(seq_axis, tp_axis),
                  P(seq_axis, tp_axis), P(seq_axis)),
        out_specs=P(seq_axis, tp_axis),
        check_vma=False,
    )
    return fn(q, k, v, segment_ids)


def cp_segment_attention(
    q: jnp.ndarray,        # [S_global, Hq, D] sharded along axis
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    impl: str = "auto",
) -> jnp.ndarray:
    """Sequence-sharded segment attention over a mesh axis.

    Semantics: identical to single-device segment attention over the global
    packed buffer, as long as each sample's slots live on one chip OR its
    id is unique across chips (the packer guarantees contiguity; samples
    spanning a shard boundary keep one global id via the per-shard offset
    only when fully local — cross-shard samples should be packed with the
    same local id on each shard and are then handled by the gathered kv).
    """
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "reference"
    if impl == "flash_rope":  # CP rotates before gathering kv; plain kernel
        impl = "flash"
    fn = jax.shard_map(
        functools.partial(_local_cp_attention, axis=axis, impl=impl),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(q, k, v, segment_ids)
