"""Combined data x tensor parallelism over a 2-axis device mesh.

The reference has neither TP nor any multi-axis composition (it delegates
distribution wholesale to Lightning DDP, reference ``train.py:270-274``).
TPU-natively the composition is, as with DP x CP, a mesh shape:

- mesh ``[data, model]`` of ``train_devices x tp_devices`` chips;
- parameters (and their AdamW moments) carry Megatron column/row shardings
  over ``model`` (``tensor_parallel.tp_spec_for``) and are replicated over
  ``data`` — the spec rules key off trailing path components, so one
  placement function covers params AND optimizer moments;
- batches are ``[D, ...]``-stacked with the leading axis on ``data``; the
  DP step's vmaps carry ``spmd_axis_name="data"`` so the head-parallel
  attention shard_map (``tp_segment_attention``) batches correctly — the
  same vmap-over-shard_map composition as DP x CP (``parallel/dpcp.py``);
- collectives: one row-parallel psum per layer inside each ``model`` group
  + the gradient all-reduce over ``data``. Zero first-party comm code.

Use ``model`` only when a model size actually needs it (kv-head count
bounds the axis: tiny=2, small=2, base/large=4); put the rest on ``data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from titok_tpu.parallel.tensor_parallel import tp_spec_for
from titok_tpu.parallel.train_step import DPTrainStepBuilder
from titok_tpu.parallel.trainer import DataParallelTrainer


def make_dptp_mesh(dp: int, tp: int, axes=("data", "model")) -> Mesh:
    devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"requested {dp}x{tp} devices, have {len(devices)}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axes)


def shard_state_tp(state, mesh: Mesh, axis: str = "model"):
    """device_put a TrainState with Megatron TP shardings on every leaf
    whose path ends in a column/row-parallel kernel — this covers
    ``gen_params``/``disc_params`` and, because optimizer moments mirror
    the param tree structure, the AdamW mu/nu as well. Everything else is
    replicated."""

    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, tp_spec_for(path, leaf, axis))
        )

    return jax.tree_util.tree_map_with_path(place, state)


class DPTPTrainStepBuilder(DPTrainStepBuilder):
    """DP step whose stacked axis is the ``data`` mesh axis of a 2D mesh;
    composes with the model's TP attention shard_map via spmd_axis_name."""

    spmd_axis_name = "data"


class DPTPTrainer(DataParallelTrainer):
    """``train_devices x tp_devices`` chips: DP over stacked packed batches
    with every matmul Megatron-split over ``model``. Host loop, grouping,
    eval and checkpoints are the DP trainer's; only the mesh, module
    construction (tp_mesh threading) and state placement differ."""

    _multihost_ok = False  # seq/model axes not laid out across processes

    def __init__(self, config, batches_fn=None):
        super().__init__(config, batches_fn)
        from titok_tpu.losses.loss_module import LossSystem
        from titok_tpu.models.titok import make_titok

        self.n_tp = int(config.training.main.get("tp_devices", 1))
        self.mesh = make_dptp_mesh(self.n_devices, self.n_tp)
        self.model = make_titok(config, tp_mesh=self.mesh)
        self.loss_system = LossSystem(config, tp_mesh=self.mesh)
        self.builder = DPTPTrainStepBuilder(self.model, self.loss_system, config)

    def _shard_stacked(self, tree):
        if tree is None:
            return None
        # leading stacked axis on data; replicated over model
        return jax.device_put(tree, NamedSharding(self.mesh, P("data")))

    def _init_state_dp(self, stacked, stacked_disc, seed: int):
        state = super()._init_state_dp(stacked, stacked_disc, seed)
        return shard_state_tp(state, self.mesh)
