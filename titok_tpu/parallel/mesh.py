"""Device mesh + sharding helpers for scale-out.

The reference delegates distribution to Lightning DDP/NCCL
(reference ``train.py:270-274``). TPU-natively there is no communication
layer to write: we lay out a ``jax.sharding.Mesh`` with a ``data`` axis,
annotate the packed-batch buffers as sharded along it and the parameters as
replicated, and the XLA SPMD partitioner inserts the gradient ``psum`` over
ICI.

Layout: a *global* batch is one PackedBatch per chip, stacked on a leading
``[data, ...]`` axis — each chip trains on its own full sequence budget, so
per-chip compute is identical to the single-chip program (no resharding,
no cross-chip attention). The only collectives are the scalar loss mean +
gradient all-reduce.

Mesh axes reserved for growth: ``data`` (used), plus optional ``seq``
(context parallelism over the packed axis) and ``model`` (tensor
parallelism) — see ``titok_tpu/parallel/train_step.py``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading axis sharded across the mesh (one PackedBatch per chip)."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(tree, mesh: Mesh, axis: str = "data"):
    """device_put a stacked batch pytree with the leading axis sharded."""
    return jax.device_put(tree, batch_sharding(mesh, axis))
