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

Caveat: the Pallas attention kernels are not SPMD-partitionable, so TP runs
use ``attn_impl='reference'`` (XLA attention partitions fine) or wrap the
kernel in shard_map per head group — left for when a model size actually
needs TP.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_PARALLEL = ("to_qkv", "w12", "w1", "w2")   # kernel [in, out]: shard out
ROW_PARALLEL = ("out_proj", "w3")              # kernel [in, out]: shard in


def tp_spec_for(path: tuple, leaf, axis: str = "model") -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    if names and names[-1] == "kernel" and len(names) >= 2:
        mod = names[-2]
        if mod in COL_PARALLEL:
            return P(None, axis)
        if mod in ROW_PARALLEL:
            return P(axis, None)
    return P()


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put a param tree with Megatron TP shardings."""
    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, tp_spec_for(path, leaf, axis))
        )

    return jax.tree_util.tree_map_with_path(place, params)
