"""Data-parallel correctness on the 8-device virtual CPU mesh:
DP-sharded step == single-device step on the same batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import pack_samples
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.models.titok import make_titok
from titok_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch_tree
from titok_tpu.parallel.train_step import DPTrainStepBuilder
from titok_tpu.training.train_step import TrainStepBuilder


def _batch(rng, seq=128):
    vids = synthetic_videos(rng, 2)
    return pack_samples(vids, [3, 5], seq_len=seq, max_samples=4,
                        patch_size=PATCH)


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


def test_dp_equals_single_device(rng):
    cfg = tiny_config()
    model = make_titok(cfg)
    ls = LossSystem(cfg)

    D = 4
    mesh = make_mesh(D)
    batches = [_batch(np.random.default_rng(i)) for i in range(D)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[b.device_arrays() for b in batches]
    )

    dp = DPTrainStepBuilder(model, ls, cfg)
    state = dp.init_state(jax.random.PRNGKey(0), stacked, None)
    dp_step = jax.jit(dp.make_train_step({}), donate_argnums=())

    sharded = shard_batch_tree(stacked, mesh)
    dp_state, dp_metrics, dp_idx = dp_step(state, sharded, None, None)

    # manual single-device: average the per-batch grads
    single = TrainStepBuilder(model, ls, cfg)
    single.make_optimizers()

    def loss_of(params, arrs):
        recon, _ = model.apply({"params": params}, arrs)
        val, _ = ls.generator_loss({}, {}, recon, arrs, None, None)
        return val

    grads = [
        jax.grad(loss_of)(state.gen_params, b.device_arrays()) for b in batches
    ]
    mean_grads = jax.tree_util.tree_map(
        lambda *g: jnp.mean(jnp.stack(g), 0), *grads
    )
    updates, _ = single.gen_tx.update(mean_grads, state.gen_opt, state.gen_params)
    import optax

    expected = optax.apply_updates(state.gen_params, updates)

    flat_dp = jax.tree_util.tree_leaves(dp_state.gen_params)
    flat_exp = jax.tree_util.tree_leaves(expected)
    for a, b in zip(flat_dp, flat_exp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    assert dp_idx.shape == (D, 128)
    losses = [float(loss_of(state.gen_params, b.device_arrays())) for b in batches]
    np.testing.assert_allclose(
        float(dp_metrics["gen/total_loss"]), np.mean(losses), atol=1e-5
    )


def test_dp_step_is_sharded(rng):
    """The stacked batch is actually placed across devices."""
    mesh = make_mesh(4)
    b = _batch(rng)
    stacked = jax.tree_util.tree_map(
        lambda x: np.stack([x] * 4), b.device_arrays()
    )
    dev = shard_batch_tree(stacked, mesh)
    shard_devs = {s.device.id for s in dev["patches"].addressable_shards}
    assert len(shard_devs) == 4
