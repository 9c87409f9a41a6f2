"""Multi-host (multi-slice) initialization helpers.

Single-host multi-chip needs nothing beyond ``jax.devices()``; across hosts
the TPU-native recipe is ``jax.distributed.initialize`` + a mesh spanning
``jax.devices()`` (all processes see the global device list), with each
process feeding only its addressable shards. This module wraps that and the
per-process data split; collectives ride ICI within a slice and DCN across
slices automatically via the SPMD partitioner.

Not exercised by tests (no multi-host environment here); the API mirrors
what the DP trainer consumes so enabling it is a config change
(``training.main.multihost: true``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Idempotent ``jax.distributed.initialize`` (env-driven on TPU pods)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def global_mesh(axis: str = "data") -> Mesh:
    """Mesh over every chip of every host."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_slice(global_batch_count: int) -> tuple[int, int]:
    """(start, count) of the PackedBatches this process must feed."""
    per = global_batch_count // jax.process_count()
    return jax.process_index() * per, per
