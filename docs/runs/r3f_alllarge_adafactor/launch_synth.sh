#!/bin/sh
# r3f (this session): ALL-LARGE GAN recipe (LARGE 24L/1024w enc+dec +
# LARGE discriminator) on ONE v5e chip via adafactor — the config that is
# impossible under AdamW (~17-19.6 GB f32 state vs 15.75 GB HBM, measured
# OOM in docs/runs/r3c_large_smoke). Synthetic stream: the WDS corpus died
# with the previous VM and regen (~100 min serial on this 1-core host)
# exceeds the session window; fit + optimizer stability do not depend on
# the data distribution. Eval + periodic saves off (no quality claim; a
# cold large eval compile alone would eat the window).
exec /opt/venv/bin/python tools/train_supervised.py config=configs/tiny.yaml \
    tokenizer.losses.perceptual_weight=0.0 \
    general.checkpoints.save_path=.scratch/r3f_synth \
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
    dataset.train_dataset=synthetic \
    dataset.eval_dataset=synthetic \
    training.main.max_steps=1500
