#!/bin/sh
# Round-3c large-capacity smoke run: 2,000 steps, LARGE (24L/1024w)
# tokenizer with remat + BASE (12L/768w) discriminator, otherwise
# identical recipe to the tiny/small/base capacity runs (same corpus,
# sampling, seq budget 6144, GAN losses). Purpose: evidence that the
# largest size in the reference's family (model/base/utils.py:8-23)
# trains on ONE chip — remat through the tokenizer, flash attention at
# width 1024 / 16 heads (exercises the scoped-VMEM block cap in
# ops/flash_attention_mh._choose_blocks) — with decreasing losses. 2k
# steps is a smoke run, not a capacity point.
#
# Why disc=base: the all-large GAN step needs 19.6 GB HBM vs the v5e's
# 15.75 (measured 2026-08-19; the f32 AdamW state for 873M total params
# is 10.5 GB before grads/activations). Large tokenizer + base disc
# keeps the state at ~8 GB and fits. An all-large recipe is a
# multi-chip job — exactly what the FSDP/CP trainers are for (see
# parallel/; the driver dryrun runs an 8-way FSDP leg).
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
    discriminator.model.model_size=base \
    training.main.remat=true \
    dataset.uint8_wire=true \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.main.max_steps=2000
