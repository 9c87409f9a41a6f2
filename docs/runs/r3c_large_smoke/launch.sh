#!/bin/sh
# Round-3c large-capacity smoke run: 2,000 steps, LARGE (24L/1024w)
# tokenizer AND discriminator with remat, otherwise identical recipe to
# the tiny/small/base capacity runs (same corpus, sampling, seq budget
# 6144, GAN losses). Purpose: evidence that the largest size in the
# reference's family (model/base/utils.py:8-23) trains on ONE chip —
# remat through tokenizer + discriminator, flash attention at width
# 1024 — with decreasing losses. 2k steps is a smoke run, not a
# capacity point (large needs far more steps than the 12k budget of the
# capacity series to pay off).
#
# Corpus: same .scratch/wds shards as docs/runs/r3b_quality_base
# (regenerate with the recipe in that launch.sh).
#
# LPIPS stays off (perceptual_weight=0.0 — the trainer hard-errors on a
# missing LPIPS checkpoint otherwise, by design).
exec python tools/train_supervised.py config=configs/tiny.yaml \
    general.wandb.run_name=r3c-large-smoke \
    tokenizer.losses.perceptual_weight=0.0 \
    general.checkpoints.save_path=.scratch/large_run \
    general.checkpoints.host_snapshot_interval=0 \
    general.checkpoints.preemption_save_timeout_s=450 \
    general.checkpoints.save_interval=500 \
    tokenizer.model.encoder_size=large \
    tokenizer.model.decoder_size=large \
    discriminator.model.model_size=large \
    training.main.remat=true \
    dataset.uint8_wire=true \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.main.max_steps=2000
