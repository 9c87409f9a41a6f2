"""Device-side eval metrics == host metrics (VERDICT r1 weak #7):
SSIM/PSNR accumulated inside the jitted eval step must match the host
numpy/scipy paths that remain as the cross-check."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util import tiny_config
from titok_tpu.data.packing import pack_samples
from titok_tpu.metrics.psnr_ssim import PSNRMetric, SSIMMetric, ssim_image
from titok_tpu.metrics.ssim_device import ssim_frames_stats
from titok_tpu.ops.frames import (
    build_eval_frame_plan,
    gather_frames,
    max_eval_frames,
)

PATCH = [2, 4, 4]


def _videos(rng, n=3):
    vids = []
    for _ in range(n):
        t = PATCH[0] * int(rng.integers(1, 3))
        h = PATCH[1] * int(rng.integers(3, 6))  # >= 12 px (>= 11 kernel)
        w = PATCH[2] * int(rng.integers(3, 6))
        vids.append(rng.uniform(-1, 1, size=(3, t, h, w)).astype(np.float32))
    return vids


def test_ssim_device_matches_host(rng):
    """Padded-buffer masked SSIM == per-image host SSIM."""
    K, Hm, Wm, C = 5, 24, 24, 3
    x = np.zeros((K, Hm, Wm, C), np.float32)
    y = np.zeros((K, Hm, Wm, C), np.float32)
    hw = np.zeros((K, 2), np.float32)
    weight = np.zeros((K,), np.float32)
    sizes = [(24, 24), (16, 20), (12, 24), (20, 12)]  # last slot stays pad
    expected = []
    for k, (h, w) in enumerate(sizes):
        xi = rng.uniform(-1, 1, size=(h, w, C)).astype(np.float32)
        yi = rng.uniform(-1, 1, size=(h, w, C)).astype(np.float32)
        x[k, :h, :w] = xi
        y[k, :h, :w] = yi
        hw[k] = (h, w)
        weight[k] = 1.0
        # host metric consumes CHW
        expected.append(ssim_image(xi.transpose(2, 0, 1), yi.transpose(2, 0, 1)))

    s_sum, s_cnt = jax.jit(ssim_frames_stats)(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(hw), jnp.asarray(weight)
    )
    assert float(s_cnt) == 4.0
    np.testing.assert_allclose(float(s_sum) / float(s_cnt),
                               np.mean(expected), atol=2e-5)


def test_eval_frame_plan_gathers_exact_frames(rng):
    """Every pixel frame of every sample comes back exactly once."""
    vids = _videos(rng, 3)
    batch = pack_samples(vids, [2, 1, 3], seq_len=256, max_samples=8,
                         patch_size=PATCH)
    kmax = max_eval_frames(256, [2, 8, 8], PATCH)
    plan = build_eval_frame_plan(
        batch, num_frames=kmax, patch_size=PATCH, max_grid_hw=[24, 24]
    )
    frames = np.asarray(gather_frames(
        jnp.asarray(batch.patches, jnp.float32), plan.device_arrays(), PATCH
    ))
    ki = 0
    for vid in vids:
        C, T, H, W = vid.shape
        for t in range(T):
            h, w = int(plan.scale[ki][0]), int(plan.scale[ki][1])
            assert (h, w) == (H, W)
            assert plan.weight[ki] == 1.0
            np.testing.assert_allclose(
                frames[ki, :H, :W], vid[:, t].transpose(1, 2, 0), atol=1e-6
            )
            ki += 1
    assert plan.weight[ki:].sum() == 0


def test_validate_device_metrics_match_host(rng, tmp_path):
    """Trainer.validate with device metrics == with host metrics."""
    from titok_tpu.training.trainer import Trainer, synthetic_batches

    over = {
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "training.sampling.min_grid": [2, 12, 12],
        "training.sampling.max_grid": [4, 24, 24],
        "training.sampling.train_seq_len": 256,
        "training.sampling.eval_seq_len": 256,
        "training.eval.eval_samples": 6,
        "training.eval.log_recon_num": 0,
        "training.main.max_steps": 1,
    }
    scores = {}
    for mode in ("device", "host"):
        cfg = tiny_config(**over)
        cfg.set_dotted("general.checkpoints.save_path",
                       str(tmp_path / mode))
        cfg.set_dotted("training.eval.device_metrics", mode == "device")
        trainer = Trainer(cfg)
        if mode == "device":
            assert trainer.device_im == ("psnr", "ssim")
        else:
            assert trainer.device_im == ()
        state = trainer._init_state(0)
        trainer.validate(state, 0)
        import json, os

        lines = [json.loads(l) for l in open(
            os.path.join(cfg.general.checkpoints.save_path, "metrics.jsonl"))]
        merged = {}
        for l in lines:
            merged.update(l)
        scores[mode] = merged

    np.testing.assert_allclose(scores["device"]["eval/psnr"],
                               scores["host"]["eval/psnr"], atol=1e-4)
    np.testing.assert_allclose(scores["device"]["eval/ssim"],
                               scores["host"]["eval/ssim"], atol=1e-4)


def test_small_grid_falls_back_to_host_ssim(rng):
    from titok_tpu.training.trainer import Trainer

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
    })  # min_grid [2,8,8]: frames smaller than the 11x11 SSIM kernel
    trainer = Trainer(cfg)
    assert "ssim" not in trainer.device_im
    assert "psnr" in trainer.device_im
    assert "ssim" in trainer.eval_metrics.metrics


def test_validate_dp_device_metrics_match_host(rng, tmp_path):
    """DP mesh eval with device-side PSNR/SSIM == host-hub metrics
    (VERDICT r2 weak #2), including masking of a short final group's
    padded repeat-rows."""
    import json
    import os

    from titok_tpu.parallel.trainer import DataParallelTrainer

    over = {
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "training.sampling.min_grid": [2, 12, 12],
        "training.sampling.max_grid": [4, 24, 24],
        "training.sampling.train_seq_len": 256,
        "training.sampling.eval_seq_len": 256,
        # synthetic eval stream yields several packed batches; with 4
        # devices the final group is short -> exercises the device-side
        # row mask
        "training.eval.eval_samples": 10,
        "training.eval.log_recon_num": 0,
        "training.eval.eval_step_interval": 0,
        "training.main.max_steps": 1,
        "training.main.train_devices": 4,
    }
    scores = {}
    for mode in ("device", "host"):
        cfg = tiny_config(**over)
        cfg.set_dotted("general.checkpoints.save_path",
                       str(tmp_path / ("dp_" + mode)))
        cfg.set_dotted("training.eval.device_metrics", mode == "device")
        trainer = DataParallelTrainer(cfg)
        assert trainer.device_im == (("psnr", "ssim") if mode == "device"
                                     else ())
        state = trainer.fit()
        trainer.validate_dp(state, 1)
        lines = [json.loads(l) for l in open(
            os.path.join(cfg.general.checkpoints.save_path, "metrics.jsonl"))]
        merged = {}
        for l in lines:
            merged.update(l)
        scores[mode] = merged

    np.testing.assert_allclose(scores["device"]["eval/psnr"],
                               scores["host"]["eval/psnr"], atol=1e-4)
    np.testing.assert_allclose(scores["device"]["eval/ssim"],
                               scores["host"]["eval/ssim"], atol=1e-4)
