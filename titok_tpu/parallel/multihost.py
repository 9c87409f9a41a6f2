"""Multi-host (multi-slice) initialization helpers.

Single-host multi-chip needs nothing beyond ``jax.devices()``; across hosts
the TPU-native recipe is ``jax.distributed.initialize`` + a mesh spanning
``jax.devices()`` (all processes see the global device list), with each
process feeding only its addressable shards. This module wraps that and the
per-process data split; collectives ride ICI within a slice and DCN across
slices automatically via the SPMD partitioner.

Production surface: set ``training.main.multihost: true`` and launch one
``train.py`` per host (reference analog: the role Lightning's DDP spawner
plays at reference ``train.py:270-274``). On TPU pods the coordinator and
process identity come from the TPU runtime (leave the keys unset); anywhere
else set ``training.main.coordinator_address/num_processes/process_id`` (or
env ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``).
Exercised for real by ``tests/test_multihost.py``: two OS processes over
Gloo CPU collectives drive the actual CLI, train, checkpoint and resume.
"""

from __future__ import annotations

import os

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
    except RuntimeError as e:
        # Only double-initialization is benign. A coordinator-unreachable /
        # barrier-timeout XlaRuntimeError also subclasses RuntimeError —
        # swallowing it would silently degrade every host to an independent
        # single-process run (all writing the same save_path).
        if jax.distributed.is_initialized():
            return  # already initialized

        raise RuntimeError(
            f"jax.distributed.initialize failed (coordinator="
            f"{coordinator_address!r}): {e}"
        ) from e


def initialize_from_config(config) -> None:
    """Production entry (``training.main.multihost: true``): resolve the
    coordinator/process identity from config keys, then env vars, then the
    TPU runtime's auto-detection (all ``None``)."""
    cm = config.training.main

    def pick(key, env, cast):
        val = cm.get(key, None)
        if val in (None, ""):
            val = os.environ.get(env)
        return cast(val) if val not in (None, "") else None

    initialize(
        coordinator_address=pick("coordinator_address",
                                 "JAX_COORDINATOR_ADDRESS", str),
        num_processes=pick("num_processes", "JAX_NUM_PROCESSES", int),
        process_id=pick("process_id", "JAX_PROCESS_ID", int),
    )


def global_mesh(axis: str = "data") -> Mesh:
    """Mesh over every chip of every host."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_slice(global_batch_count: int) -> tuple[int, int]:
    """(start, count) of the PackedBatches this process must feed."""
    per = global_batch_count // jax.process_count()
    return jax.process_index() * per, per


def is_primary() -> bool:
    """True on the process that should own host-side logging."""
    return jax.process_index() == 0
