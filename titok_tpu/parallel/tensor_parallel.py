"""Tensor parallelism: Megatron-style parameter sharding over a ``model``
mesh axis.

The reference has no TP (SURVEY.md §2.3) and at TiTok widths (256-1024) it
is rarely worth the collectives; it exists here so the mesh generalizes
beyond DP/CP when model sizes grow. Implementation is pure sharding
annotation — the modules need no code changes; the XLA SPMD partitioner
splits the matmuls and inserts the all-reduces:

- ``to_qkv`` / ``w12`` kernels: output-dim sharded (column parallel);
- ``out_proj`` / ``w3`` kernels: input-dim sharded (row parallel, psum on
  the output);
- everything else (norms, mask token, proj_in/out, biases): replicated.

The Pallas attention kernel is not SPMD-partitionable by annotation, but
attention is HEAD-parallel: :func:`tp_segment_attention` runs the kernel
inside ``shard_map`` with q/k/v sharded along the head axis — zero
collectives in attention itself (the column-parallel qkv projection
already emits head-sharded activations, and the row-parallel ``out_proj``
contributes the one psum per layer). GQA constraint: both q and kv head
counts must divide the mesh axis (tiny = 4q/2kv heads → TP2 natural;
shard kv-heads first, duplicate beyond Hkv if ever needed).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_PARALLEL = ("to_qkv", "w12", "w1", "w2")   # kernel [in, out]: shard out
ROW_PARALLEL = ("out_proj", "w3")              # kernel [in, out]: shard in


def tp_spec_for(path: tuple, leaf, axis: str = "model") -> P:
    """Megatron spec for a param/optimizer-state leaf, keyed off trailing
    path components. Rank-aware so the same rule covers:

    - the kernels themselves and any state that mirrors them at full
      shape (AdamW mu/nu, optax.ema momentum, non-factored Adafactor v):
      rank-2 leaves → column/row spec;
    - Adafactor's FACTORED second-moment vectors
      (``optax.scale_by_factored_rms``: ``v_row`` has shape [in],
      ``v_col`` shape [out]): rank-1 leaves sharded iff they lie along
      the kernel's sharded dim — v_col for column-parallel, v_row for
      row-parallel; the cross-dim mean that produces the other vector
      reduces over the sharded axis and GSPMD inserts the psum;
    - dummy (1,) placeholders (the unfactored slot of a factored param
      and vice versa): replicated.
    """
    # DictKey carries .key, GetAttrKey (NamedTuple states like optax's
    # FactoredState) carries .name — normalize both. Explicit None checks:
    # an `or`-chain would drop falsy keys (0, "") to str(p)
    names = [next((str(k) for k in (getattr(p, "key", None),
                                    getattr(p, "name", None))
                   if k is not None), str(p))
             for p in path]
    if names and names[-1] == "kernel" and len(names) >= 2:
        mod = names[-2]
        ndim = getattr(leaf, "ndim", 0)
        size = int(getattr(leaf, "size", 0) or 0)
        factored = next((n for n in names if n in ("v_row", "v_col")), None)
        if mod in COL_PARALLEL:
            if ndim == 2:
                return P(None, axis)
            if ndim == 1 and size > 1 and factored == "v_col":
                return P(axis)
        elif mod in ROW_PARALLEL:
            if ndim == 2:
                return P(axis, None)
            if ndim == 1 and size > 1 and factored == "v_row":
                return P(axis)
    return P()


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put a param tree with Megatron TP shardings."""
    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, tp_spec_for(path, leaf, axis))
        )

    return jax.tree_util.tree_map_with_path(place, params)


def tp_segment_attention(
    q,              # [S, Hq, D] sharded P(None, axis, None)
    k,              # [S, Hkv, D]
    v,
    segment_ids,    # [S] replicated
    mesh: Mesh,
    axis: str = "model",
    impl: str = "auto",
    max_seg_len: int | None = None,
):
    """Head-parallel segment attention: each shard runs the (Pallas or
    dense) kernel on its local head group. No collectives — softmax and
    the weighted sum are per-head."""
    n = mesh.shape[axis]
    assert q.shape[1] % n == 0 and k.shape[1] % n == 0, (
        f"q heads {q.shape[1]} and kv heads {k.shape[1]} must divide the "
        f"{axis!r} mesh axis ({n})"
    )
    from titok_tpu.ops.attention import segment_attention

    fn = jax.shard_map(
        functools.partial(segment_attention, impl=impl,
                          max_seg_len=max_seg_len),
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(None, axis, None), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v, segment_ids)
