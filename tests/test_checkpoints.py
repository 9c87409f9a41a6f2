"""Tolerant weights-only restore (reference ``train.py:265-267``
``strict=False``): a checkpoint from a differently-shaped run must load
the intersecting keys and keep fresh init for the rest."""

import numpy as np
import pytest

import jax

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import build_disc_batch, pack_samples
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.models.titok import make_titok
from titok_tpu.train_utils.checkpoints import CheckpointManager, restore_weights_only
from titok_tpu.training.train_step import TrainStepBuilder


def _state(cfg, batch, seed=0):
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    builder = TrainStepBuilder(model, ls, cfg)
    disc = build_disc_batch(batch, ls.disc_tokens) if ls.use_disc else None
    return builder.init_state(
        jax.random.PRNGKey(seed), batch.device_arrays(),
        disc.device_arrays() if disc else None,
    )


def _leaves_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(fa, fb))


def test_disc_off_checkpoint_into_disc_on_state(rng, tmp_path):
    batch = pack_samples(synthetic_videos(rng, 2), [2, 3], seq_len=128,
                         max_samples=8, patch_size=PATCH)

    cfg_off = tiny_config()  # disc_weight 0.0 -> no disc params
    state_off = _state(cfg_off, batch, seed=1)
    assert state_off.disc_params == {}

    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval=1)
    ckpt.save(0, state_off)
    ckpt.wait()

    cfg_on = tiny_config(**{"tokenizer.losses.disc_weight": 0.4})
    state_on = _state(cfg_on, batch, seed=2)
    fresh_disc = state_on.disc_params

    restored = restore_weights_only(str(tmp_path / "ck" / "0"), state_on)
    # generator weights came from the checkpoint
    assert _leaves_equal(restored.gen_params, state_off.gen_params)
    assert not _leaves_equal(restored.gen_params, state_on.gen_params)
    # disc keeps its fresh init (missing from the checkpoint)
    assert _leaves_equal(restored.disc_params, fresh_disc)
    # optimizer state and step untouched
    assert int(restored.step) == 0
    assert _leaves_equal(restored.gen_opt, state_on.gen_opt)


def test_disc_on_checkpoint_into_disc_off_state(rng, tmp_path):
    batch = pack_samples(synthetic_videos(rng, 2), [2, 3], seq_len=128,
                         max_samples=8, patch_size=PATCH)
    cfg_on = tiny_config(**{"tokenizer.losses.disc_weight": 0.4})
    state_on = _state(cfg_on, batch, seed=1)
    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval=1)
    ckpt.save(0, state_on)
    ckpt.wait()

    cfg_off = tiny_config()
    state_off = _state(cfg_off, batch, seed=2)
    restored = restore_weights_only(str(tmp_path / "ck" / "0"), state_off)
    assert _leaves_equal(restored.gen_params, state_on.gen_params)
    assert restored.disc_params == {}
