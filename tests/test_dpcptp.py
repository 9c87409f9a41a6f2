"""3-axis DP x CP x TP on the 8-device virtual CPU mesh (2 data rows x
2 seq shards x 2 head groups): the full GAN train step over the 3D mesh
must equal the plain DP step (itself proven equal to the manually-averaged
single-device update in test_parallel.py) on the same stacked global
batches. Indices are exact; params within float-reassociation tolerance
(the TP row-parallel psum reassociates the contraction)."""

import numpy as np

import jax

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import build_disc_batch, pack_samples
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.losses.lpips import load_lpips_params
from titok_tpu.models.titok import make_titok
from titok_tpu.ops.frames import build_perceptual_plan
from titok_tpu.parallel.dpcptp import (
    DPCPTPTrainStepBuilder,
    make_dpcptp_mesh,
    shard_stacked_dpcptp,
)
from titok_tpu.parallel.mesh import make_mesh, shard_batch_tree
from titok_tpu.parallel.train_step import DPTrainStepBuilder

DP, CP, TP = 2, 2, 2


def _global_batch(rng, seq=256):
    vids = synthetic_videos(rng, 4)
    return pack_samples(vids, [5, 9, 3, 2], seq_len=seq, max_samples=8,
                        patch_size=PATCH)


def _cfg():
    return tiny_config(**{
        "tokenizer.losses.disc_weight": 0.4,
        "tokenizer.losses.perceptual_weight": 1.0,
        "tokenizer.losses.gram_weight": 0.1,
        "training.sampling.train_seq_len": 256,
    })


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def test_dpcptp_full_gan_step_equals_dp(rng):
    cfg = _cfg()
    lpips_params = load_lpips_params("/nonexistent", seed=0)

    batches = [_global_batch(np.random.default_rng(i)) for i in range(DP)]
    ls_probe = LossSystem(cfg)
    discs = [build_disc_batch(b, ls_probe.disc_tokens, pad_to=CP)
             for b in batches]
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

    # ---- plain DP over 2 devices (the proven baseline) -------------------
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

    # ---- DP x CP x TP over the full 2x2x2 mesh ---------------------------
    mesh = make_dpcptp_mesh(DP, CP, TP)
    model_3d = make_titok(cfg, cp_mesh=mesh, tp_mesh=mesh)
    ls_3d = LossSystem(cfg, cp_mesh=mesh, tp_mesh=mesh)
    b3 = DPCPTPTrainStepBuilder(model_3d, ls_3d, cfg)
    b3.make_optimizers()
    step3 = jax.jit(b3.make_train_step(lpips_params), donate_argnums=())
    s_3d, m_3d, idx_3d = step3(
        state, shard_stacked_dpcptp(stacked, mesh),
        shard_stacked_dpcptp(stacked_d, mesh),
        shard_stacked_dpcptp(stacked_p, mesh),
    )

    for k in ("gen/total_loss", "gen/recon_loss", "gen/g_loss",
              "gen/perceptual_loss", "disc/total_loss", "disc/d_loss",
              "disc/r1_penalty"):
        # 2e-4 matches the DPTP equivalence test: the TP row-parallel psum
        # reassociates every contraction (indices below remain exact)
        np.testing.assert_allclose(float(m_3d[k]), float(m_dp[k]), atol=2e-4,
                                   err_msg=k)
    np.testing.assert_array_equal(np.asarray(idx_3d), np.asarray(idx_dp))
    for a, b in zip(jax.tree_util.tree_leaves(s_3d.gen_params),
                    jax.tree_util.tree_leaves(s_dp.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_3d.disc_params),
                    jax.tree_util.tree_leaves(s_dp.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dpcptp_batch_actually_sharded(rng):
    mesh = make_dpcptp_mesh(DP, CP, TP)
    batches = [_global_batch(np.random.default_rng(i)) for i in range(DP)]
    stacked = _stack([b.device_arrays() for b in batches])
    dev = shard_stacked_dpcptp(stacked, mesh)
    # packed buffers split across data x seq = 4 distinct shards,
    # replicated over model (so present on all 8 chips)
    assert len({s.device.id for s in dev["patches"].addressable_shards}) == 8
    assert dev["patches"].sharding.spec == jax.sharding.PartitionSpec(
        "data", "seq")
    tc = dev["token_counts"]
    assert tc.sharding.spec == jax.sharding.PartitionSpec("data")


def test_dpcptp_trainer_fit_synthetic(tmp_path):
    """DPCPTPTrainer end-to-end: full GAN steps + mesh eval on 2x2x2."""
    from titok_tpu.parallel.dpcptp import DPCPTPTrainer

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "tokenizer.losses.disc_weight": 0.4,
        "training.sampling.train_seq_len": 256,
        "training.sampling.eval_seq_len": 256,
        "training.main.train_devices": DP,
        "training.main.cp_devices": CP,
        "training.main.tp_devices": TP,
        "training.main.max_steps": 2,
        "training.eval.eval_step_interval": 2,
        "training.eval.eval_samples": 3,
        "training.eval.log_recon_num": 1,
    })
    cfg.set_dotted("general.checkpoints.save_path", str(tmp_path))
    cfg.set_dotted("general.checkpoints.save_interval", 10)
    trainer = DPCPTPTrainer(cfg)
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


def test_dpcptp_steps_per_call_runs(tmp_path):
    """3-axis scan mode: steps_per_call=2 over the 2x2x2 mesh compiles and
    advances (grouped batches shard data x seq, replicate over model;
    TP-sharded state threads through the lax.scan carry)."""
    from titok_tpu.parallel.dpcptp import DPCPTPTrainer

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "tokenizer.losses.disc_weight": 0.4,
        "training.sampling.train_seq_len": 256,
        "training.sampling.eval_seq_len": 256,
        "training.main.train_devices": 2,
        "training.main.cp_devices": 2,
        "training.main.tp_devices": 2,
        "training.main.max_steps": 2,
        "training.main.steps_per_call": 2,
        "training.eval.eval_step_interval": 100,
        "training.eval.eval_samples": 2,
        "training.eval.log_recon_num": 0,
    })
    cfg.set_dotted("general.checkpoints.save_path", str(tmp_path))
    cfg.set_dotted("general.checkpoints.save_interval", 10)
    state = DPCPTPTrainer(cfg).fit()
    assert int(state.step) == 2
    import json, os
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    merged = {}
    for l in lines:
        merged.update(l)
    assert np.isfinite(merged["train/gen/total_loss"])
    assert np.isfinite(merged["train/disc/total_loss"])
