"""Data-parallel Trainer: same host loop, mesh-sharded batches.

Collects ``train_devices`` PackedBatches per step from the data stream,
stacks them on a leading axis and device_puts with the ``data``-axis
sharding; the jitted DP step does the rest (see
``titok_tpu/parallel/train_step.py``).
"""

from __future__ import annotations

import time
from typing import Iterator

import jax
import numpy as np

from titok_tpu.data.packing import unpack_indices
from titok_tpu.parallel.mesh import batch_sharding, make_mesh
from titok_tpu.parallel.train_step import DPTrainStepBuilder
from titok_tpu.training.trainer import Trainer


def stack_trees(trees: list[dict]) -> dict:
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


class DataParallelTrainer(Trainer):
    def __init__(self, config, batches_fn=None):
        super().__init__(config, batches_fn)
        self.n_devices = int(config.training.main.get("train_devices", 1))
        self.mesh = make_mesh(self.n_devices)
        self.builder = DPTrainStepBuilder(self.model, self.loss_system, config)
        # DP eval parallelizes the forward across the mesh; image metrics
        # stay on the host hub here (device_im is a single-chip fast path)
        from titok_tpu.metrics.eval_metrics import EvalMetrics

        self.device_im = ()
        self.eval_metrics = EvalMetrics(config)

    def _init_state_dp(self, stacked, stacked_disc, seed: int):
        """Initialize (or restore) train state from the first stacked
        group. DPTPTrainer overrides this to place Megatron shardings on
        params + moments."""
        state = self.builder.init_state(
            jax.random.PRNGKey(seed), stacked, stacked_disc
        )
        state = self._maybe_restore(state)
        # a restored state comes back committed to device 0 (orbax); spread
        # it over the mesh so it is compatible with the sharded batches
        from titok_tpu.parallel.mesh import replicated

        return jax.device_put(state, replicated(self.mesh))

    def _shard_stacked(self, tree):
        """device_put a ``[D, ...]``-stacked batch tree onto the mesh.
        Plain DP shards the leading axis only; DPCPTrainer overrides this
        to additionally shard the packed axis along ``seq``."""
        if tree is None:
            return None
        return jax.device_put(tree, batch_sharding(self.mesh))

    def _stacked_batches(self, seed: int) -> Iterator[tuple]:
        """Group the packed stream into [D, ...] stacked device arrays."""
        it = self.batches_fn(self.config, eval=False, seed=seed)
        rng = np.random.default_rng(seed + 1)
        group, group_extras = [], []
        for batch in it:
            group.append(batch)
            group_extras.append(self._build_extras(batch, rng))
            if len(group) == self.n_devices:
                yield group, group_extras
                group, group_extras = [], []

    def fit(self):
        cfg = self.config
        cm = cfg.training.main
        max_steps = int(cm.max_steps)
        log_every = int(cfg.general.wandb.get("log_step_interval", 50))
        eval_every = int(cfg.training.eval.get("eval_step_interval", 1000))
        seed = int(cm.get("seed", 0))

        # init from the first group
        group_iter = self._stacked_batches(seed)
        group, group_extras = next(group_iter)
        stacked = stack_trees([b.device_arrays() for b in group])
        stacked_disc = (
            stack_trees([e["disc"].device_arrays() for e in group_extras])
            if self.loss_system.use_disc else None
        )
        state = self._init_state_dp(stacked, stacked_disc, seed)
        self._install_preemption_save(lambda: state)
        train_step = jax.jit(self.builder.make_train_step(self.lpips_params),
                             donate_argnums=(0,))
        self._eval_step = jax.jit(self.builder.make_eval_step())

        def feed():
            yield (stacked, stacked_disc, group, group_extras)
            for g, ge in group_iter:
                s = stack_trees([b.device_arrays() for b in g])
                sd = (stack_trees([e["disc"].device_arrays() for e in ge])
                      if self.loss_system.use_disc else None)
                yield (s, sd, g, ge)

        t_last = time.time()
        tokens_since = 0
        step_num = int(state.step)  # host-tracked; avoids a device sync/step
        for s, sd, g, ge in feed():
            if step_num >= max_steps:
                break
            sp = (
                stack_trees([e["perc"].device_arrays() for e in ge])
                if self.loss_system.use_perceptual else None
            )
            s_dev = self._shard_stacked(s)
            sd_dev = self._shard_stacked(sd)
            sp_dev = self._shard_stacked(sp)

            state, metrics, indices = train_step(state, s_dev, sd_dev, sp_dev)
            tokens_since += sum(b.seq_len for b in g)

            if self.codebook_logger is not None:
                idx_host = np.asarray(indices)
                for d, b in enumerate(g):
                    self.codebook_logger(unpack_indices(idx_host[d], b))

            if step_num % log_every == 0:
                scalars = {"train/" + k: v for k, v in metrics.items()}
                dt = time.time() - t_last
                scalars["perf/tokens_per_sec"] = tokens_since / max(dt, 1e-9)
                scalars["perf/devices"] = self.n_devices
                t_last, tokens_since = time.time(), 0
                self.logger.log_metrics(scalars, step_num)
                self.logger.log_console(scalars, step_num)

            if eval_every and step_num > 0 and step_num % eval_every == 0:
                self.validate_dp(state, step_num)

            self.ckpt.maybe_save(step_num, state)
            step_num += 1

        self.ckpt.save(int(state.step), state)
        self.ckpt.wait()
        return state

    def validate_dp(self, state, step_num: int):
        """Mesh-parallel eval: batches grouped D at a time, sharded along
        the ``data`` axis, one jitted program evals all D per step (a
        short final group is padded by repeating its last batch; padded
        rows never reach the metrics)."""
        from titok_tpu.data.packing import unpack_videos

        def flush(group):
            n_real = len(group)
            padded = group + [group[-1]] * (self.n_devices - n_real)
            stacked = stack_trees([b.device_arrays() for b in padded])
            dev = self._shard_stacked(stacked)
            recon_rows, _ = self._eval_step(
                state.gen_params, dev, state.vq_state or None
            )
            recon_host = np.asarray(recon_rows, np.float32)
            for d in range(n_real):
                recon = unpack_videos(recon_host[d], group[d], self.patch_size)
                target = unpack_videos(
                    np.asarray(group[d].patches, np.float32), group[d],
                    self.patch_size,
                )
                self.eval_metrics.update(recon, target)

        group: list = []
        for batch in self.batches_fn(self.config, eval=True, seed=0):
            group.append(batch)
            if len(group) == self.n_devices:
                flush(group)
                group = []
        if group:
            flush(group)

        scores = self.eval_metrics.compute()
        self.eval_metrics.reset()
        self.logger.log_metrics(scores, step_num)
        self.logger.log_console(scores, step_num)
