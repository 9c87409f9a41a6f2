"""Combined data x context parallelism over a 2-axis device mesh.

The reference delegates all distribution to Lightning DDP (reference
``train.py:270-274``); it has neither CP nor a DP x CP composition
(SURVEY.md §2.3). TPU-natively the composition is a mesh shape, not new
communication code:

- mesh ``[data, seq]`` of ``train_devices x cp_devices`` chips;
- each of the ``data`` rows holds ONE global PackedBatch whose packed
  ``[S]`` axis is sharded ``cp_devices``-way along ``seq`` (the CP design,
  see ``titok_tpu/parallel/cp.py``) — so one *sequence budget* spans a
  ``seq`` ring, and independent budgets replicate across ``data``;
- the train step is the DP step (vmap over the stacked ``[D, ...]`` axis)
  with ``spmd_axis_name="data"``: JAX's shard_map batching rule inserts the
  ``data`` axis into the CP attention shard_map's in/out specs, so the kv
  all-gather stays *within* each ``seq`` ring (4 chips of ICI), while the
  loss mean / gradient all-reduce psums across the full mesh — exactly the
  collective layout you'd draw by hand.

Scaling guidance: use ``seq`` only as large as the budget requires (kv
gather traffic is linear in the ring size) and put the rest of the pod on
``data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from titok_tpu.parallel.cp import _SEQ_KEYS
from titok_tpu.parallel.train_step import DPTrainStepBuilder
from titok_tpu.parallel.trainer import DataParallelTrainer


def make_dpcp_mesh(dp: int, cp: int, axes=("data", "seq")) -> Mesh:
    devices = jax.devices()
    if dp * cp > len(devices):
        raise ValueError(
            f"requested {dp}x{cp} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: dp * cp]).reshape(dp, cp)
    return Mesh(grid, axes)


def dpcp_shardings(tree: dict, mesh: Mesh) -> dict:
    """Per-leaf shardings for a ``[D, ...]``-stacked batch dict: the leading
    stacked axis along ``data``; packed ``[S]`` axes (dim 1) along ``seq``;
    per-sample metadata and perceptual plans replicated over ``seq``."""
    both = NamedSharding(mesh, P("data", "seq"))
    data = NamedSharding(mesh, P("data"))
    return {k: (both if k in _SEQ_KEYS else data) for k in tree}


def shard_stacked_dpcp(tree: dict, mesh: Mesh) -> dict:
    sh = dpcp_shardings(tree, mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in tree.items()}


class DPCPTrainStepBuilder(DPTrainStepBuilder):
    """DP step whose stacked axis is the ``data`` mesh axis of a 2D mesh;
    composes with the model's CP attention shard_map via spmd_axis_name."""

    spmd_axis_name = "data"


class DPCPTrainer(DataParallelTrainer):
    """``train_devices x cp_devices`` chips: DP over independent global
    packed batches, each sharded along a ``seq`` ring (CP). Host loop,
    grouping, eval and checkpoints are the DP trainer's; only the mesh,
    module construction (cp_mesh threading) and batch placement differ."""

    _multihost_ok = False  # seq/model axes not laid out across processes

    def __init__(self, config, batches_fn=None):
        super().__init__(config, batches_fn)
        from titok_tpu.losses.loss_module import LossSystem
        from titok_tpu.models.titok import make_titok
        from titok_tpu.training.train_step import TrainStepBuilder  # noqa: F401

        self.n_cp = int(config.training.main.get("cp_devices", 1))
        cs = config.training.sampling
        for key in ("train_seq_len", "eval_seq_len"):
            assert int(cs[key]) % self.n_cp == 0, (
                f"{key}={cs[key]} must be divisible by cp_devices={self.n_cp}"
            )
        # both quantizer families work: the EMA-VQ lookup is seq-sharded via
        # shard_map (ops/vq_distance.vq_nearest_cp) and batches over 'data'
        # through the same spmd_axis_name mechanism as attention
        self.mesh = make_dpcp_mesh(self.n_devices, self.n_cp)
        # rebuild the module tree with the 2D mesh threaded into attention;
        # the attention shard_map names only 'seq' — 'data' is injected by
        # the vmap(spmd_axis_name) batching rule in DPCPTrainStepBuilder
        self.model = make_titok(config, cp_mesh=self.mesh)
        self.loss_system = LossSystem(config, cp_mesh=self.mesh)
        self.builder = DPCPTrainStepBuilder(self.model, self.loss_system, config)

    def _build_extras(self, batch, rng):
        from titok_tpu.data.packing import build_disc_batch
        from titok_tpu.ops.frames import build_perceptual_plan

        extras = {}
        if self.loss_system.use_disc:
            # pad the disc buffer so its packed axis divides the seq ring
            extras["disc"] = build_disc_batch(
                batch, self.loss_system.disc_tokens, pad_to=self.n_cp
            )
        if self.loss_system.use_perceptual:
            extras["perc"] = build_perceptual_plan(
                batch,
                num_frames=self.loss_system.num_frames,
                sample_size=self.loss_system.sample_size,
                patch_size=self.patch_size,
                max_grid_hw=self.max_grid[1:],
                rng=rng,
            )
        return extras

    def _shard_stacked(self, tree):
        if tree is None:
            return None
        return shard_stacked_dpcp(tree, self.mesh)

    def _shard_grouped(self, tree):
        """[K, D, S, ...] scan groups (``steps_per_call``): scan axis
        replicated, stacked axis on ``data``, packed axes on ``seq``."""
        if tree is None:
            return None
        both = NamedSharding(self.mesh, P(None, "data", "seq"))
        data = NamedSharding(self.mesh, P(None, "data"))
        return {k: jax.device_put(v, both if k in _SEQ_KEYS else data)
                for k, v in tree.items()}
