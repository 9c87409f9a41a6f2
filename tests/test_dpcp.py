"""Combined DP x CP on the 8-device virtual CPU mesh (2 data rows x 4 seq
shards): the full GAN train step over the 2D mesh must equal the plain DP
step (itself proven equal to the manually-averaged single-device update in
test_parallel.py) on the same stacked global batches."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import build_disc_batch, pack_samples
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.losses.lpips import load_lpips_params
from titok_tpu.models.titok import make_titok
from titok_tpu.ops.frames import build_perceptual_plan
from titok_tpu.parallel.dpcp import (
    DPCPTrainStepBuilder,
    make_dpcp_mesh,
    shard_stacked_dpcp,
)
from titok_tpu.parallel.mesh import make_mesh, shard_batch_tree
from titok_tpu.parallel.train_step import DPTrainStepBuilder

DP, CP = 2, 4


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


def test_dpcp_full_gan_step_equals_dp(rng):
    cfg = _cfg()
    lpips_params = load_lpips_params("/nonexistent", seed=0)

    batches = [_global_batch(np.random.default_rng(i)) for i in range(DP)]
    # one disc plan for both paths, padded so [Sd] divides the seq ring
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

    # ---- DP x CP over the full 2x4 mesh ----------------------------------
    mesh = make_dpcp_mesh(DP, CP)
    model_cp = make_titok(cfg, cp_mesh=mesh)
    ls_cp = LossSystem(cfg, cp_mesh=mesh)
    dpcp = DPCPTrainStepBuilder(model_cp, ls_cp, cfg)
    dpcp.make_optimizers()
    dpcp_step = jax.jit(dpcp.make_train_step(lpips_params), donate_argnums=())
    s_cp, m_cp, idx_cp = dpcp_step(
        state, shard_stacked_dpcp(stacked, mesh),
        shard_stacked_dpcp(stacked_d, mesh),
        shard_stacked_dpcp(stacked_p, mesh),
    )

    for k in ("gen/total_loss", "gen/recon_loss", "gen/g_loss",
              "gen/perceptual_loss", "disc/total_loss", "disc/d_loss",
              "disc/r1_penalty"):
        np.testing.assert_allclose(float(m_cp[k]), float(m_dp[k]), atol=2e-5,
                                   err_msg=k)
    np.testing.assert_array_equal(np.asarray(idx_cp), np.asarray(idx_dp))
    for a, b in zip(jax.tree_util.tree_leaves(s_cp.gen_params),
                    jax.tree_util.tree_leaves(s_dp.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_cp.disc_params),
                    jax.tree_util.tree_leaves(s_dp.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_dpcp_batch_actually_sharded(rng):
    mesh = make_dpcp_mesh(DP, CP)
    batches = [_global_batch(np.random.default_rng(i)) for i in range(DP)]
    stacked = _stack([b.device_arrays() for b in batches])
    dev = shard_stacked_dpcp(stacked, mesh)
    # packed buffers split across all 8 chips
    assert len({s.device.id for s in dev["patches"].addressable_shards}) == 8
    # per-sample metadata sharded on data only (replicated along seq)
    tc = dev["token_counts"]
    assert tc.sharding.spec == jax.sharding.PartitionSpec("data")


def test_dpcp_trainer_fit_synthetic(tmp_path):
    """DPCPTrainer end-to-end: full GAN steps + mesh eval on a 2x4 mesh."""
    from titok_tpu.parallel.dpcp import DPCPTrainer

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "tokenizer.losses.disc_weight": 0.4,
        "training.sampling.train_seq_len": 256,
        "training.sampling.eval_seq_len": 256,
        "training.main.train_devices": DP,
        "training.main.cp_devices": CP,
        "training.main.max_steps": 2,
        "training.eval.eval_step_interval": 2,
        "training.eval.eval_samples": 3,
        "training.eval.log_recon_num": 1,
    })
    cfg.set_dotted("general.checkpoints.save_path", str(tmp_path))
    cfg.set_dotted("general.checkpoints.save_interval", 10)
    trainer = DPCPTrainer(cfg)
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


def test_dpcp_steps_per_call_matches_k1(tmp_path):
    """DPCP scan mode (steps_per_call=2 on a 2x2 mesh, tail of 1): same
    trajectory as the one-step loop on the same deterministic synthetic
    stream — the grouped [K, D, S] batches shard along data AND seq."""
    from titok_tpu.parallel.dpcp import DPCPTrainer

    def run(out, k):
        cfg = tiny_config(**{
            "dataset.train_dataset": "synthetic",
            "dataset.eval_dataset": "synthetic",
            "tokenizer.losses.disc_weight": 0.4,
            "training.sampling.train_seq_len": 256,
            "training.sampling.eval_seq_len": 256,
            "training.main.train_devices": 2,
            "training.main.cp_devices": 2,
            "training.main.max_steps": 3,
            "training.main.steps_per_call": k,
            "training.eval.eval_step_interval": 100,
            "training.eval.eval_samples": 2,
            "training.eval.log_recon_num": 0,
        })
        cfg.set_dotted("general.checkpoints.save_path", str(out))
        cfg.set_dotted("general.checkpoints.save_interval", 10)
        return DPCPTrainer(cfg).fit()

    s1 = run(tmp_path / "k1", 1)
    s2 = run(tmp_path / "k2", 2)
    assert int(s1.step) == int(s2.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(s1.gen_params),
                    jax.tree_util.tree_leaves(s2.gen_params)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert float(np.linalg.norm(a - b)) / max(
            float(np.linalg.norm(a)), 1e-6) < 5e-3
