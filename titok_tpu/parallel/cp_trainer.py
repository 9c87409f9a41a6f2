"""Context-parallel Trainer: ONE global packed batch per step, sharded
along a ``seq`` mesh axis (``training.main.cp_devices``).

Use when a single sequence budget should exceed one chip's HBM (giant
clips, giant budgets): ``train_seq_len`` is the GLOBAL budget; each chip
holds ``train_seq_len / cp_devices`` rows. The host loop, losses,
checkpoints and eval are the base Trainer's — only module construction
(cp_mesh threading), disc-buffer padding, and device placement differ.
See ``titok_tpu/parallel/cp.py`` for the design.
"""

from __future__ import annotations

import numpy as np

from titok_tpu.data.packing import PackedBatch, build_disc_batch
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.models.titok import make_titok
from titok_tpu.ops.frames import build_perceptual_plan
from titok_tpu.parallel.cp import make_cp_mesh, shard_packed_tree
from titok_tpu.training.train_step import TrainStepBuilder
from titok_tpu.training.trainer import Trainer


class ContextParallelTrainer(Trainer):
    supports_steps_per_call = False  # seq-sharded loader: no scan axis

    def __init__(self, config, batches_fn=None):
        super().__init__(config, batches_fn)
        self.n_shards = int(config.training.main.get("cp_devices", 1))
        cs = config.training.sampling
        for key in ("train_seq_len", "eval_seq_len"):
            assert int(cs[key]) % self.n_shards == 0, (
                f"{key}={cs[key]} must be divisible by cp_devices={self.n_shards}"
            )
        # both quantizer families are CP-compatible: FSQ is elementwise, and
        # the EMA-VQ lookup runs per seq shard inside shard_map
        # (ops/vq_distance.vq_nearest_cp; EMA stats psum'd by the partitioner)
        self.mesh = make_cp_mesh(self.n_shards)
        # rebuild the module tree with the CP mesh threaded into attention
        self.model = make_titok(config, cp_mesh=self.mesh)
        self.loss_system = LossSystem(config, cp_mesh=self.mesh)
        self.builder = TrainStepBuilder(self.model, self.loss_system, config)
        self._loader_sharding = lambda arrs: shard_packed_tree(arrs, self.mesh)

    def _build_extras(self, batch: PackedBatch, rng: np.random.Generator) -> dict:
        extras = {}
        if self.loss_system.use_disc:
            extras["disc"] = build_disc_batch(
                batch, self.loss_system.disc_tokens, pad_to=self.n_shards
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

    # validate() is inherited unchanged: the jitted eval step contains the
    # shard_map CP op, and jit reshards the host-fed eval arrays onto the
    # mesh automatically (uncommitted inputs follow the computation's
    # sharding constraints).
