"""3-axis parallelism: data x context x tensor over a [data, seq, model]
device mesh.

The reference delegates everything to Lightning DDP on a single device
(reference ``train.py:270-274``, SURVEY.md §2.3); no multi-axis composition
exists there. TPU-natively all three strategies are *orthogonal sharding
annotations on one mesh*, and their composition is mechanical:

- mesh ``[data, seq, model]`` of ``train_devices x cp_devices x tp_devices``
  chips;
- each ``data`` row holds ONE global PackedBatch whose packed ``[S]`` axis
  is sharded ``cp_devices``-way along ``seq`` (the CP design,
  ``parallel/cp.py``);
- parameters and AdamW moments carry Megatron column/row shardings over
  ``model`` (``tensor_parallel.tp_spec_for``) and are replicated over
  ``data`` and ``seq``;
- attention runs the combined seq x head shard_map
  (``context_parallel.cptp_segment_attention``): q stays local per chip,
  its local head-group's kv is gathered over the ``seq`` ring only;
- the train step is the DP step (vmap over the stacked ``[D, ...]`` axis)
  with ``spmd_axis_name="data"`` — the same vmap-over-shard_map batching
  composition proven pairwise in ``parallel/dpcp.py`` / ``parallel/dptp.py``.

Collective layout per layer: one kv all-gather per ``seq`` ring, one
row-parallel psum per ``model`` group, and the gradient all-reduce over
``data`` — all inserted by the SPMD partitioner / shard_map, zero
first-party communication code.

Scaling guidance: ``model`` is bounded by kv-head count (tiny=2, base=4);
use ``seq`` only as large as the token budget requires (kv-gather traffic
is linear in ring size); put everything else on ``data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from titok_tpu.parallel.cp import _SEQ_KEYS
from titok_tpu.parallel.dptp import shard_state_tp
from titok_tpu.parallel.train_step import DPTrainStepBuilder
from titok_tpu.parallel.trainer import DataParallelTrainer


def make_dpcptp_mesh(dp: int, cp: int, tp: int,
                     axes=("data", "seq", "model")) -> Mesh:
    devices = jax.devices()
    if dp * cp * tp > len(devices):
        raise ValueError(
            f"requested {dp}x{cp}x{tp} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: dp * cp * tp]).reshape(dp, cp, tp)
    return Mesh(grid, axes)


def dpcptp_shardings(tree: dict, mesh: Mesh) -> dict:
    """Per-leaf shardings for a ``[D, ...]``-stacked batch dict: the
    stacked axis along ``data``; packed ``[S]`` axes (dim 1) along ``seq``;
    everything replicated over ``model`` (activations are only
    head/width-sharded *inside* the layers, by the partitioner)."""
    both = NamedSharding(mesh, P("data", "seq"))
    data = NamedSharding(mesh, P("data"))
    return {k: (both if k in _SEQ_KEYS else data) for k in tree}


def shard_stacked_dpcptp(tree: dict, mesh: Mesh) -> dict:
    sh = dpcptp_shardings(tree, mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in tree.items()}


class DPCPTPTrainStepBuilder(DPTrainStepBuilder):
    """DP step whose stacked axis is the ``data`` axis of a 3D mesh; the
    vmap's spmd_axis_name threads ``data`` into the model's combined
    seq x head attention shard_map."""

    spmd_axis_name = "data"


class DPCPTPTrainer(DataParallelTrainer):
    """``train_devices x cp_devices x tp_devices`` chips. Host loop,
    grouping, eval and checkpoints are the DP trainer's; the mesh, module
    construction (both meshes threaded into attention), disc-buffer
    padding (CP) and TP state placement are the union of the two 2-axis
    trainers (``DPCPTrainer`` / ``DPTPTrainer``)."""

    _multihost_ok = False  # seq/model axes not laid out across processes

    def __init__(self, config, batches_fn=None):
        super().__init__(config, batches_fn)
        from titok_tpu.losses.loss_module import LossSystem
        from titok_tpu.models.titok import make_titok

        cm = config.training.main
        self.n_cp = int(cm.get("cp_devices", 1))
        self.n_tp = int(cm.get("tp_devices", 1))
        cs = config.training.sampling
        for key in ("train_seq_len", "eval_seq_len"):
            assert int(cs[key]) % self.n_cp == 0, (
                f"{key}={cs[key]} must be divisible by cp_devices={self.n_cp}"
            )
        # both quantizer families work: the EMA-VQ lookup is seq-sharded via
        # shard_map (ops/vq_distance.vq_nearest_cp) and batches over 'data'
        # through the same spmd_axis_name mechanism as attention
        self.mesh = make_dpcptp_mesh(self.n_devices, self.n_cp, self.n_tp)
        # the same mesh serves both roles; attention sees cp_axis="seq"
        # and tp_axis="model" and runs the combined shard_map
        self.model = make_titok(config, cp_mesh=self.mesh, tp_mesh=self.mesh)
        self.loss_system = LossSystem(config, cp_mesh=self.mesh,
                                      tp_mesh=self.mesh)
        self.builder = DPCPTPTrainStepBuilder(self.model, self.loss_system,
                                              config)

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
        return shard_stacked_dpcptp(tree, self.mesh)

    def _shard_grouped(self, tree):
        """[K, D, S, ...] scan groups (``steps_per_call``): scan axis
        replicated, stacked axis on ``data``, packed axes on ``seq``,
        everything replicated over ``model``."""
        if tree is None:
            return None
        both = NamedSharding(self.mesh, P(None, "data", "seq"))
        data = NamedSharding(self.mesh, P(None, "data"))
        return {k: jax.device_put(v, both if k in _SEQ_KEYS else data)
                for k, v in tree.items()}

    def _init_state_dp(self, stacked, stacked_disc, seed: int):
        state = super()._init_state_dp(stacked, stacked_disc, seed)
        return shard_state_tp(state, self.mesh)
