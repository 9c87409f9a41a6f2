"""Combined DP x TP on the 8-device virtual CPU mesh (4 data rows x 2
model shards — tiny has 2 kv heads, bounding the model axis at 2): the
full GAN train step with Megatron-sharded params + head-parallel attention
must equal the plain DP step on the same stacked batches."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import build_disc_batch, pack_samples
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.losses.lpips import load_lpips_params
from titok_tpu.models.titok import make_titok
from titok_tpu.ops.frames import build_perceptual_plan
from titok_tpu.parallel.dptp import (
    DPTPTrainStepBuilder,
    make_dptp_mesh,
    shard_state_tp,
)
from titok_tpu.parallel.mesh import make_mesh, shard_batch_tree
from titok_tpu.parallel.train_step import DPTrainStepBuilder

DP, TP = 4, 2


def _batch(rng, seq=128):
    vids = synthetic_videos(rng, 2)
    return pack_samples(vids, [3, 5], seq_len=seq, max_samples=4,
                        patch_size=PATCH)


def _cfg():
    return tiny_config(**{
        "tokenizer.losses.disc_weight": 0.4,
        "tokenizer.losses.perceptual_weight": 1.0,
        "tokenizer.losses.gram_weight": 0.1,
    })


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def test_dptp_full_gan_step_equals_dp(rng):
    cfg = _cfg()
    lpips_params = load_lpips_params("/nonexistent", seed=0)

    batches = [_batch(np.random.default_rng(i)) for i in range(DP)]
    ls_probe = LossSystem(cfg)
    discs = [build_disc_batch(b, ls_probe.disc_tokens) for b in batches]
    percs = [
        build_perceptual_plan(
            b, num_frames=ls_probe.num_frames, sample_size=ls_probe.sample_size,
            patch_size=PATCH, max_grid_hw=[16, 16],
            rng=np.random.default_rng(100 + i),
        )
        for i, b in enumerate(batches)
    ]
    stacked = _stack([b.device_arrays() for b in batches])
    stacked_d = _stack([d.device_arrays() for d in discs])
    stacked_p = _stack([p.device_arrays() for p in percs])

    # ---- plain DP over 4 devices (the proven baseline) -------------------
    model_dp = make_titok(cfg)
    ls_dp = LossSystem(cfg)
    dp = DPTrainStepBuilder(model_dp, ls_dp, cfg)
    state = dp.init_state(jax.random.PRNGKey(0), stacked, stacked_d)
    mesh_dp = make_mesh(DP)
    dp_step = jax.jit(dp.make_train_step(lpips_params), donate_argnums=())
    s_dp, m_dp, idx_dp = dp_step(
        state, shard_batch_tree(stacked, mesh_dp),
        shard_batch_tree(stacked_d, mesh_dp),
        shard_batch_tree(stacked_p, mesh_dp),
    )

    # ---- DP x TP over the full 4x2 mesh ----------------------------------
    mesh = make_dptp_mesh(DP, TP)
    model_tp = make_titok(cfg, tp_mesh=mesh)
    ls_tp = LossSystem(cfg, tp_mesh=mesh)
    dptp = DPTPTrainStepBuilder(model_tp, ls_tp, cfg)
    dptp.make_optimizers()
    state_tp = shard_state_tp(state, mesh)
    # params actually Megatron-sharded
    qkv = state_tp.gen_params["encoder"]["model_layers"]["attn_0"]["to_qkv"][
        "kernel"]
    assert qkv.sharding.spec == P(None, "model")

    dptp_step = jax.jit(dptp.make_train_step(lpips_params), donate_argnums=())
    batch_sh = jax.sharding.NamedSharding(mesh, P("data"))
    s_tp, m_tp, idx_tp = dptp_step(
        state_tp, jax.device_put(stacked, batch_sh),
        jax.device_put(stacked_d, batch_sh),
        jax.device_put(stacked_p, batch_sh),
    )

    # TP splits contraction dims (row-parallel psum) — float reassociation
    # gives O(1e-5..1e-4) drift vs the unsplit matmuls; indices stay exact
    for k in ("gen/total_loss", "gen/recon_loss", "gen/g_loss",
              "gen/perceptual_loss", "disc/total_loss", "disc/d_loss",
              "disc/r1_penalty"):
        np.testing.assert_allclose(float(m_tp[k]), float(m_dp[k]), atol=2e-4,
                                   err_msg=k)
    np.testing.assert_array_equal(np.asarray(idx_tp), np.asarray(idx_dp))
    for a, b in zip(jax.tree_util.tree_leaves(s_tp.gen_params),
                    jax.tree_util.tree_leaves(s_dp.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_tp.disc_params),
                    jax.tree_util.tree_leaves(s_dp.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dptp_adafactor_step_equals_dp(rng):
    """Adafactor x TP (new in round 4): the factored v_row/v_col vectors
    carry rank-aware Megatron shardings (v_col along ``model`` for
    column-parallel kernels, v_row for row-parallel) and the sharded GAN
    step matches plain DP within TP reassociation tolerance."""
    cfg = tiny_config(**{
        "tokenizer.losses.disc_weight": 0.4,
        "optimizer.name": "adafactor",
    })

    batches = [_batch(np.random.default_rng(i)) for i in range(DP)]
    ls_probe = LossSystem(cfg)
    discs = [build_disc_batch(b, ls_probe.disc_tokens) for b in batches]
    stacked = _stack([b.device_arrays() for b in batches])
    stacked_d = _stack([d.device_arrays() for d in discs])

    model_dp = make_titok(cfg)
    dp = DPTrainStepBuilder(model_dp, LossSystem(cfg), cfg)
    state = dp.init_state(jax.random.PRNGKey(0), stacked, stacked_d)
    mesh_dp = make_mesh(DP)
    dp_step = jax.jit(dp.make_train_step({}), donate_argnums=())
    s_dp, m_dp, idx_dp = dp_step(
        state, shard_batch_tree(stacked, mesh_dp),
        shard_batch_tree(stacked_d, mesh_dp), None,
    )

    mesh = make_dptp_mesh(DP, TP)
    model_tp = make_titok(cfg, tp_mesh=mesh)
    dptp = DPTPTrainStepBuilder(model_tp, LossSystem(cfg, tp_mesh=mesh), cfg)
    dptp.make_optimizers()
    state_tp = shard_state_tp(state, mesh)

    # the factored second-moment vectors are genuinely sharded: v_col of
    # a column-parallel kernel lies along the kernel's out dim
    flat = jax.tree_util.tree_flatten_with_path(state_tp.gen_opt)[0]
    checked_col = checked_row = False
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        if "v_col" in names and "to_qkv" in names and leaf.ndim == 1 \
                and leaf.size > 1:
            assert leaf.sharding.spec == P("model"), names
            checked_col = True
        if "v_row" in names and "out_proj" in names and leaf.ndim == 1 \
                and leaf.size > 1:
            assert leaf.sharding.spec == P("model"), names
            checked_row = True
    assert checked_col and checked_row, "factored vectors not found"

    dptp_step = jax.jit(dptp.make_train_step({}), donate_argnums=())
    batch_sh = jax.sharding.NamedSharding(mesh, P("data"))
    s_tp, m_tp, idx_tp = dptp_step(
        state_tp, jax.device_put(stacked, batch_sh),
        jax.device_put(stacked_d, batch_sh), None,
    )

    for k in ("gen/total_loss", "gen/recon_loss", "disc/total_loss"):
        np.testing.assert_allclose(float(m_tp[k]), float(m_dp[k]),
                                   atol=2e-4, err_msg=k)
    np.testing.assert_array_equal(np.asarray(idx_tp), np.asarray(idx_dp))
    for a, b in zip(jax.tree_util.tree_leaves(s_tp.gen_params),
                    jax.tree_util.tree_leaves(s_dp.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_dptp_trainer_fit_synthetic(tmp_path):
    """DPTPTrainer end-to-end on a 4x2 mesh, incl. pure-TP (dp=1) state
    placement through _init_state_dp."""
    from titok_tpu.parallel.dptp import DPTPTrainer

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "tokenizer.losses.disc_weight": 0.4,
        "training.main.train_devices": DP,
        "training.main.tp_devices": TP,
        "training.main.max_steps": 2,
        "training.eval.eval_step_interval": 2,
        "training.eval.eval_samples": 3,
        "training.eval.log_recon_num": 1,
    })
    cfg.set_dotted("general.checkpoints.save_path", str(tmp_path))
    cfg.set_dotted("general.checkpoints.save_interval", 10)
    trainer = DPTPTrainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 2
    trainer.validate_dp(state, 2)

    import json, os
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    merged = {}
    for l in lines:
        merged.update(l)
    assert np.isfinite(merged["train/gen/total_loss"])
    assert np.isfinite(merged["train/disc/total_loss"])
    assert np.isfinite(merged["eval/psnr"])


def test_dptp_steps_per_call_runs(tmp_path):
    """DPxTP scan mode: grouped [K, D, ...] batches (replicated over
    model) drive the Megatron-sharded state through the scan carry."""
    from titok_tpu.parallel.dptp import DPTPTrainer

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "tokenizer.losses.disc_weight": 0.4,
        "training.sampling.train_seq_len": 256,
        "training.sampling.eval_seq_len": 256,
        "training.main.train_devices": 2,
        "training.main.tp_devices": 2,
        "training.main.max_steps": 2,
        "training.main.steps_per_call": 2,
        "training.eval.eval_step_interval": 100,
        "training.eval.eval_samples": 2,
        "training.eval.log_recon_num": 0,
    })
    cfg.set_dotted("general.checkpoints.save_path", str(tmp_path))
    cfg.set_dotted("general.checkpoints.save_interval", 10)
    state = DPTPTrainer(cfg).fit()
    assert int(state.step) == 2
