#!/bin/sh
# Continuation of the r3b base run: 12,000 -> 18,000 steps. The 12k run
# ended with rPSNR still climbing (17.58 -> 17.73 -> 17.73 with SSIM
# rising); this buys 6k more steps from the final checkpoint. The LR
# schedule is recomputed from the new max_steps (the trainer evaluates
# schedule(step) from config each step, train_utils/lr_schedulers.py),
# so the resumed run re-enters the 18k cosine at step 12k (~3.5e-5,
# decaying to the 1e-5 floor at 18k) — a warm restart, not a re-tuned
# longer run; the first 12k steps were trained under the shorter
# schedule. Same corpus/eval as launch.sh (the supervisor auto-appends
# resume_from_checkpoint when the run dir has checkpoints).
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
