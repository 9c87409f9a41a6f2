"""End-to-end train-step tests: L1-only overfit, full GAN+LPIPS step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import build_disc_batch, pack_samples
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.losses.lpips import LPIPS
from titok_tpu.models.titok import make_titok
from titok_tpu.ops.frames import build_perceptual_plan
from titok_tpu.training.train_step import TrainStepBuilder


def _make_batch(rng, cfg, n=3):
    vids = synthetic_videos(rng, n)
    tcs = [int(rng.integers(1, 8)) for _ in range(n)]
    return pack_samples(
        vids, tcs, seq_len=cfg.training.sampling.train_seq_len,
        max_samples=8, patch_size=PATCH,
    )


def test_l1_overfit(rng):
    """Loss decreases when overfitting one small batch with L1 only."""
    cfg = tiny_config()
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    builder = TrainStepBuilder(model, ls, cfg)

    batch = _make_batch(rng, cfg)
    arrs = batch.device_arrays()
    state = builder.init_state(jax.random.PRNGKey(0), arrs, None)
    step = jax.jit(builder.make_train_step(lpips_params={}))

    losses = []
    for _ in range(12):
        state, metrics, _ = step(state, arrs, None, None)
        losses.append(float(metrics["gen/total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_full_gan_lpips_step(rng):
    """One full step with disc + LPIPS + gram enabled: runs, finite."""
    cfg = tiny_config(**{
        "tokenizer.losses.disc_weight": 0.4,
        "tokenizer.losses.perceptual_weight": 1.0,
        "tokenizer.losses.gram_weight": 0.1,
    })
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    builder = TrainStepBuilder(model, ls, cfg)

    batch = _make_batch(rng, cfg)
    disc = build_disc_batch(batch, ls.disc_tokens)
    perc = build_perceptual_plan(
        batch, num_frames=ls.num_frames, sample_size=ls.sample_size,
        patch_size=PATCH, max_grid_hw=cfg.training.sampling.max_grid[1:],
        rng=np.random.default_rng(0),
    )
    arrs, darrs, parrs = batch.device_arrays(), disc.device_arrays(), perc.device_arrays()

    lpips_params = LPIPS().init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16, 16, 3)),
    )["params"]

    state = builder.init_state(jax.random.PRNGKey(0), arrs, darrs)
    step = jax.jit(builder.make_train_step(lpips_params))
    state, metrics, indices = step(state, arrs, darrs, parrs)

    for key in ["gen/total_loss", "gen/recon_loss", "gen/perceptual_loss",
                "gen/gram_loss", "gen/g_loss", "disc/total_loss",
                "disc/d_loss", "disc/r1_penalty", "disc/r2_penalty",
                "disc/centering_loss", "g_lr", "d_lr"]:
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), (key, metrics[key])
    assert indices.shape == (cfg.training.sampling.train_seq_len,)

    # step 0 runs at lr=0 (linear warmup from zero, like the reference's
    # LambdaLR); by step 2 the params must actually move
    state2, m2, _ = step(state, arrs, darrs, parrs)
    state3, m3, _ = step(state2, arrs, darrs, parrs)
    assert float(m3["gen/total_loss"]) != float(m2["gen/total_loss"])


def test_loss_ignores_padding(rng):
    """Adding a pad-only region must not change the loss."""
    cfg = tiny_config()
    model = make_titok(cfg)
    ls = LossSystem(cfg)

    vids = synthetic_videos(rng, 2)
    b_small = pack_samples(vids, [2, 3], seq_len=96, max_samples=8, patch_size=PATCH)
    b_large = pack_samples(vids, [2, 3], seq_len=160, max_samples=8, patch_size=PATCH)

    params = model.init(jax.random.PRNGKey(0), b_small.device_arrays())["params"]

    def loss_of(b):
        arrs = b.device_arrays()
        recon, _ = model.apply({"params": params}, arrs)
        val, _ = ls.generator_loss({}, {}, recon, arrs, None, None)
        return float(val)

    assert abs(loss_of(b_small) - loss_of(b_large)) < 1e-5


def test_nonfinite_grads_skipped(rng):
    """One overflowing batch must not NaN the params (observed live at
    base scale: an inf grad spike + clip_by_global_norm turned the whole
    model NaN). With the guard on (default) the bad step is skipped and
    training continues; with it off, params go NaN."""
    cfg = tiny_config()
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    builder = TrainStepBuilder(model, ls, cfg)

    batch = _make_batch(rng, cfg)
    arrs = batch.device_arrays()
    bad = dict(arrs)
    bad["patches"] = jnp.asarray(arrs["patches"]).at[0, 0].set(jnp.inf)

    state = builder.init_state(jax.random.PRNGKey(0), arrs, None)
    step = jax.jit(builder.make_train_step(lpips_params={}))

    state, m, _ = step(state, arrs, None, None)
    assert float(m["nonfinite_grad/generator"]) == 0.0
    state, m, _ = step(state, bad, None, None)
    assert float(m["nonfinite_grad/generator"]) == 1.0
    leaves = jax.tree_util.tree_leaves(state.gen_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # training continues normally on the next good batch
    state, m, _ = step(state, arrs, None, None)
    assert float(m["nonfinite_grad/generator"]) == 0.0
    assert np.isfinite(float(m["gen/total_loss"]))

    # guard off: the same bad batch NaNs the params (documents why the
    # default is on)
    cfg_off = tiny_config(**{"training.main.skip_nonfinite_grads": False})
    builder_off = TrainStepBuilder(make_titok(cfg_off), LossSystem(cfg_off),
                                   cfg_off)
    state2 = builder_off.init_state(jax.random.PRNGKey(0), arrs, None)
    step2 = jax.jit(builder_off.make_train_step(lpips_params={}))
    state2, m2, _ = step2(state2, bad, None, None)
    leaves2 = jax.tree_util.tree_leaves(state2.gen_params)
    assert not all(np.isfinite(np.asarray(l)).all() for l in leaves2)
