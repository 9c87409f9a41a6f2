#!/bin/sh
# Round-3d quantizer ablation: FSQ-16k ([8,8,8,6,5] = 15,360 codes) at
# tiny capacity, 12,000 steps on the same corpus / sampling / seq budget
# (6144) / GAN recipe as the capacity series (docs/runs/r3_quality_1200
# tiny FSQ-875, r3_quality_small, r3b_quality_base). Purpose: the second
# north-star config from BASELINE.json (FSQ-16k ablation,
# reference configs/tiny.yaml:17 comment) as a QUALITY point — the shape
# has only ever been benched, never trained on chip.
#
# Corpus: same .scratch/wds shards as docs/runs/r3b_quality_base
# (regenerate with the recipe in that launch.sh).
#
# LPIPS stays off (perceptual_weight=0.0 — the trainer hard-errors on a
# missing LPIPS checkpoint otherwise, by design).
exec python tools/train_supervised.py config=configs/tiny_fsq16k.yaml \
    general.wandb.run_name=r3d-fsq16k \
    tokenizer.losses.perceptual_weight=0.0 \
    general.checkpoints.save_path=.scratch/fsq16k_run \
    general.checkpoints.host_snapshot_interval=0 \
    general.checkpoints.preemption_save_timeout_s=450 \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.main.max_steps=12000
