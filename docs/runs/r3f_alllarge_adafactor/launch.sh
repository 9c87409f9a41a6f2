#!/bin/sh
# Round-3f: the ALL-LARGE GAN recipe (LARGE 24L/1024w encoder + decoder
# + LARGE discriminator) on ONE v5e chip — the configuration that is
# impossible under AdamW (f32 state for 873M params -> ~17 GB peak vs
# 15.75 GB HBM, measured OOM 2026-08-19, docs/runs/r3c_large_smoke/)
# and becomes a single-chip job with `optimizer.name: adafactor`
# (factored second moments + bf16 momentum, ~6 B/param of state;
# tools/flops.py --size large --optimizer adafactor -> ~12 GB peak).
#
# Purpose: evidence that (a) the full-large GAN state fits and trains
# on one chip, (b) Adafactor is stable through the relativistic-GAN +
# finite-diff-R1/R2 step at the top of the size family. Same corpus,
# sampling, seq budget 6144, and 160-clip held-out eval as the
# capacity series; steps sized to the session window, not convergence
# (5,000 — chained after the 12k r3e large run in the same session).
#
# LPIPS off (perceptual_weight=0.0) — no pretrained VGG on this image.
exec python tools/train_supervised.py config=configs/tiny.yaml \
    general.wandb.run_name=r3f-alllarge-adafactor \
    tokenizer.losses.perceptual_weight=0.0 \
    general.checkpoints.save_path=.scratch/alllarge_run \
    general.checkpoints.host_snapshot_interval=0 \
    general.checkpoints.preemption_save_timeout_s=450 \
    general.checkpoints.save_interval=1000 \
    tokenizer.model.encoder_size=large \
    tokenizer.model.decoder_size=large \
    discriminator.model.model_size=large \
    optimizer.name=adafactor \
    training.main.remat=true \
    dataset.uint8_wire=true \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.main.max_steps=5000
