"""FSDP (ZeRO-3-style) parameter + optimizer sharding over the ``data`` axis.

The reference has no sharded-state mode at all — Lightning DDP replicates
the model per rank and all-reduces gradients (reference ``train.py:270-274``).
On TPU the memory-scaling counterpart is a *sharding annotation*, not a
wrapper class: place every large TrainState leaf (params, AdamW mu/nu, the
EMA-VQ codebook) sharded along the same ``data`` mesh axis that shards the
batch, and let the XLA SPMD partitioner insert the parameter all-gathers in
the forward/backward and the gradient reduce-scatters before the sharded
optimizer update. Per-chip state memory drops ~1/D while the math stays the
DP math (all-gather is exact; only float reassociation differs).

Composition notes:
- Plain-DP only (`training.main.fsdp: true` with ``train_devices > 1``);
  TP already shards params over ``model`` and CP shards activations — mixing
  FSDP in would re-shard the same bytes for no win at these model sizes.
- Multi-host composes (``training.main.multihost: true``): the data axis —
  and with it every FSDP state shard — spans all processes' chips, so the
  parameter all-gathers and grad reduce-scatters ride DCN across hosts.
  Exercised by ``tests/test_multihost.py`` (two OS processes over Gloo).
- The train step is the unmodified DP step; the trainer pins the *output*
  state back to the FSDP shardings (``_wrap_train_step``) so the sharding
  survives the optimizer update regardless of what propagation infers, and
  buffer donation stays shape- and sharding-compatible.
- Small leaves (norm scales, biases, scalars — below ``MIN_SHARD_ELEMS``)
  stay replicated: sub-kilobyte shards cost more in collective latency than
  they save in HBM.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaves smaller than this stay replicated (elements, not bytes)
MIN_SHARD_ELEMS = 8192


def fsdp_spec_for(leaf, n_shards: int, axis: str = "data") -> P:
    """Shard the largest dimension divisible by the axis size; replicate
    scalars, small leaves, and shapes with no divisible dimension."""
    shape = tuple(getattr(leaf, "shape", ()))
    size = 1
    for s in shape:
        size *= s
    if not shape or size < MIN_SHARD_ELEMS:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: (shape[d], -d),
                  reverse=True)
    for d in dims:
        if shape[d] % n_shards == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def fsdp_shardings(state, mesh: Mesh, axis: str = "data"):
    """Tree of NamedShardings matching ``state``'s structure."""
    n = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, fsdp_spec_for(leaf, n, axis)), state
    )


def shard_state_fsdp(state, mesh: Mesh, axis: str = "data"):
    """device_put a TrainState with FSDP shardings. The rule is shape-based,
    so AdamW moments (which mirror the param trees leaf-for-leaf) land on
    the same spec as their parameters automatically."""
    return jax.tree_util.tree_map(
        lambda leaf, sh: jax.device_put(leaf, sh),
        state, fsdp_shardings(state, mesh, axis),
    )


from titok_tpu.parallel.trainer import DataParallelTrainer


class FSDPTrainer(DataParallelTrainer):
    """DataParallelTrainer whose TrainState lives sharded over ``data``.
    Host loop, grouping, eval, checkpoints: all inherited — only state
    placement and the output-sharding pin differ."""

    def __init__(self, config, batches_fn=None):
        super().__init__(config, batches_fn)
        self._fsdp_shardings = None

    def _init_state_dp(self, stacked, stacked_disc, seed: int):
        state = super()._init_state_dp(stacked, stacked_disc, seed)
        self._fsdp_shardings = fsdp_shardings(state, self.mesh)
        if self.n_procs > 1:
            # multi-host: the replicated state super() placed is committed
            # to the global mesh, and device_put can only re-place *host*
            # inputs onto a sharding with non-addressable devices — drop to
            # numpy first (replicated values are identical on every
            # process, so each process contributes consistent shards).
            # Checkpoint save/restore needs no special casing: orbax writes
            # cross-process sharded jax.Arrays natively (the same
            # multiprocess path the replicated DP state already exercises)
            # and restore happens before placement, on host arrays.
            state = jax.device_get(state)
        return jax.tree_util.tree_map(
            lambda leaf, sh: jax.device_put(leaf, sh),
            state, self._fsdp_shardings,
        )

    def _wrap_train_step(self, fn):
        def wrapped(state, batch, disc, perc):
            new_state, metrics, indices = fn(state, batch, disc, perc)
            new_state = jax.lax.with_sharding_constraint(
                new_state, self._fsdp_shardings
            )
            return new_state, metrics, indices

        return wrapped
