#!/bin/sh
# Continuation of the r3b base run: 12,000 -> 18,000 steps. The 12k run
# ended with rPSNR still climbing (17.58 -> 17.73 -> 17.73 with SSIM
# rising); this buys 6k more steps from the final checkpoint. Note the
# LR schedule already reached end_lr at 12k, so the continuation trains
# at the floor LR (1e-5 * ratio) rather than a fresh cosine — a cheap
# extension, not a re-tuned longer run. Same corpus/eval as launch.sh
# (the supervisor auto-appends resume_from_checkpoint when the run dir
# has checkpoints).
exec python tools/train_supervised.py config=configs/tiny.yaml \
    general.wandb.run_name=r3b-base-quality \
    tokenizer.losses.perceptual_weight=0.0 \
    general.checkpoints.save_path=.scratch/base_run \
    general.checkpoints.host_snapshot_interval=0 \
    general.checkpoints.preemption_save_timeout_s=450 \
    tokenizer.model.encoder_size=base \
    tokenizer.model.decoder_size=base \
    discriminator.model.model_size=base \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.main.max_steps=18000
