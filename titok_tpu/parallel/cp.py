"""Context-parallel training: one global packed batch sharded along a
``seq`` mesh axis.

The reference scales batch×length on one device via sequence packing under
a token budget (``dataset/video_dataset.py:130-172``). CP extends the same
design across chips: the budget becomes ``n_chips × per-chip budget``, the
packer emits ONE global PackedBatch (unchanged code — just a bigger
``train_seq_len``), and the jitted train step runs with every ``[S, ...]``
buffer sharded along the ``seq`` axis:

- row-wise ops (projections, norms, FFN, FSQ) are partitioned by the SPMD
  partitioner with zero communication;
- attention routes through the shard_map CP op (q local, kv + k-segment-ids
  gathered over ICI, block skipping prunes non-intersecting kv blocks —
  see ``context_parallel.py``);
- per-sample loss reductions are ``segment_sum``s over the sharded axis;
  the partitioner inserts the final psum.

Samples spanning a shard boundary need no special casing: ids are global,
so the gathered-kv attention and the segment sums see exactly the
single-device math.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaves sharded along the packed axis (first dim = S or Sd); everything
# else (per-sample [Bmax] metadata, perceptual plans) stays replicated
_SEQ_KEYS = frozenset({
    "patches", "segment_ids", "token_mask", "rope_cos", "rope_sin",
    "patch_gather", "is_patch",
})


def make_cp_mesh(n_devices: int, axis: str = "seq") -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def cp_shardings(tree: dict, mesh: Mesh, axis: str = "seq") -> dict:
    """Per-leaf NamedShardings for a PackedBatch/DiscBatch array dict."""
    seq = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return {k: (seq if k in _SEQ_KEYS else repl) for k in tree}


def shard_packed_tree(tree: dict, mesh: Mesh, axis: str = "seq") -> dict:
    """device_put a batch dict with the packed axis sharded."""
    sh = cp_shardings(tree, mesh, axis)
    return {k: jax.device_put(v, sh[k]) for k, v in tree.items()}
