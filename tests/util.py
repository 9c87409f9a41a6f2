"""Shared test helpers: tiny configs + synthetic packed batches."""

import numpy as np

from titok_tpu.config import Config

PATCH = [2, 4, 4]


def tiny_config(**over) -> Config:
    cfg = Config(
        {
            "general": {
                "wandb": {"project": "test", "run_name": "test", "log_step_interval": 1},
                "checkpoints": {
                    "save_path": "out_ckpt", "save_interval": 100, "keep_prior": 2,
                    "resume_from_checkpoint": None, "init_from_checkpoint": None,
                },
            },
            "tokenizer": {
                "model": {
                    "patch_size": PATCH,
                    "fsq_levels": [7, 5, 5, 5, 5],
                    "encoder_size": "tiny",
                    "decoder_size": "tiny",
                },
                "losses": {
                    "disc_weight": 0.0,
                    "perceptual_weight": 0.0,
                    "gram_weight": 0.0,
                    "perceptual_samples_per_step": 2,
                    "perceptual_sampling_size": 16,
                },
            },
            "discriminator": {
                "model": {"patch_size": PATCH, "model_size": "tiny"},
                "losses": {"gp_weight": 0.1, "gp_noise": 0.1, "centering_weight": 0.01},
            },
            "optimizer": {
                "learning_rate": 1e-3, "end_lr": 1e-4, "beta1": 0.5, "beta2": 0.96,
                "warmup_steps": 2, "weight_decay": 1e-4, "disc_lr_ratio": 0.5,
            },
            "dataset": {"train_dataset": "", "eval_dataset": "", "workers": 0,
                        "pin_memory": False},
            "training": {
                "sampling": {
                    "token_range": [1, 8],
                    "min_grid": [2, 8, 8],
                    "max_grid": [4, 16, 16],
                    "fps_range": [3, 5],
                    "max_aspect_ratio": 2,
                    "min_scale": 0.8,
                    "train_seq_len": 128,
                    "eval_seq_len": 128,
                },
                "main": {
                    "max_steps": 100, "precision": "32", "seed": 0,
                    "max_grad_norm": 1.0, "attn_impl": "reference",
                },
                "eval": {
                    "eval_step_interval": 50, "eval_samples": 4,
                    "log_codebook": True, "log_metrics": ["psnr", "ssim"],
                    "log_recon_num": 1, "random_recon": False, "clear_cache": False,
                },
            },
        }
    )
    for k, v in over.items():
        cfg.set_dotted(k, v)
    return cfg


def synthetic_videos(rng, n=3, patch=PATCH):
    """Small random clips with patch-multiple dims."""
    vids = []
    for _ in range(n):
        t = patch[0] * int(rng.integers(1, 3))
        h = patch[1] * int(rng.integers(2, 5))
        w = patch[2] * int(rng.integers(2, 5))
        vids.append(rng.uniform(-1, 1, size=(3, t, h, w)).astype(np.float32))
    return vids
