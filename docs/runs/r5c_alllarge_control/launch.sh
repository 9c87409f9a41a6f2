#!/bin/sh
# Round-5: the all-large evidence window round 3 asked for — WITH the
# base-step control that was the point. r3f's 2026-08-20 window showed
# anomalous >8 s/step stepping after a 27-min compile and no control
# measurement existed to say whether the chip or the config was slow.
#
# Protocol:
#   1. CONTROL: 150 steps of the plain-base GAN recipe (the r3b shape,
#      ~0.6-0.7 s/step on a healthy relay) — timestamps bracket the
#      window's health.
#   2. ALL-LARGE: LARGE enc+dec+disc + adafactor + remat (the config
#      AdamW cannot fit in one v5e's 15.75 GB HBM — see
#      docs/runs/r3c_large_smoke), 1,500 steps on the real WDS corpus,
#      hard-capped at 50 min wall (metrics flush every 50 steps, so a
#      slow-step anomaly still yields its measurement without eating
#      the window).
#   3. CONTROL again: 150 base steps — detects a mid-window relay slide.
# Eval/saves off everywhere: the claim is step-time + loss curves.
set -x
cd /root/repo
PY=/opt/venv/bin/python
control() {
  rm -rf .scratch/r5c_base_control
  $PY tools/train_supervised.py config=configs/tiny.yaml \
    tokenizer.losses.perceptual_weight=0.0 \
    general.checkpoints.save_path=.scratch/r5c_base_control \
    general.checkpoints.host_snapshot_interval=0 \
    general.checkpoints.save_interval=0 \
    training.eval.eval_step_interval=0 \
    tokenizer.model.encoder_size=base \
    tokenizer.model.decoder_size=base \
    discriminator.model.model_size=base \
    dataset.uint8_wire=true \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.main.max_steps=150
}
control
cp .scratch/r5c_base_control/metrics.jsonl /tmp/r5c_control_pre.jsonl
timeout 3000 $PY tools/train_supervised.py config=configs/tiny.yaml \
    tokenizer.losses.perceptual_weight=0.0 \
    general.checkpoints.save_path=.scratch/r5c_alllarge \
    general.checkpoints.host_snapshot_interval=0 \
    general.checkpoints.preemption_save_timeout_s=60 \
    general.checkpoints.save_interval=0 \
    training.eval.eval_step_interval=0 \
    tokenizer.model.encoder_size=large \
    tokenizer.model.decoder_size=large \
    discriminator.model.model_size=large \
    optimizer.name=adafactor \
    training.main.remat=true \
    dataset.uint8_wire=true \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.main.max_steps=1500
control
cp .scratch/r5c_base_control/metrics.jsonl /tmp/r5c_control_post.jsonl
