#!/bin/sh
# Round-3b base-capacity quality run: 12,000 steps, base (12L/768w)
# tokenizer AND discriminator, otherwise identical to
# docs/runs/r3_quality_1200 (tiny) and docs/runs/r3_quality_small (small).
#
# Corpus (regenerate with tools/gen_dataset.py — deterministic by seed):
#   train: seeds 0 x120 + 99 x1080 (offset 120)   -> convert_to_wds, 64/shard
#   eval:  seed 777 x160                           -> convert_to_wds, 64/shard
#
#   python tools/gen_dataset.py .scratch/raw/train --num 120  --seed 0
#   python tools/gen_dataset.py .scratch/raw/train --num 1080 --seed 99 --offset 120
#   python tools/gen_dataset.py .scratch/raw/eval  --num 160  --seed 777
#   python -m titok_tpu.data.convert_to_wds .scratch/raw/train .scratch/wds/train --shard-size 64
#   python -m titok_tpu.data.convert_to_wds .scratch/raw/eval  .scratch/wds/eval  --shard-size 64
#
# LPIPS stays off (perceptual_weight=0.0 — the trainer hard-errors on a
# missing LPIPS checkpoint otherwise, by design); loss = L1 +
# relativistic GAN as in the companion runs.
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
    training.main.max_steps=12000
