#!/bin/sh
# Round-5 continuation of r3e: large 12,000 -> 18,000 steps. The 12k run
# closed the capacity series at 17.95 dB with slope still positive
# (README.md) — the top capacity point was left censored; this buys the
# same 6k-step extension base got (docs/runs/r3b_quality_base/
# continue_18k.sh). Identical recipe to launch.sh: large enc+dec, BASE
# disc (all-large is a multi-chip job, r3c README), remat, uint8 wire,
# same corpus + frozen eval protocol. The LR schedule is recomputed from
# max_steps=18000 — a warm restart re-entering the 18k cosine at step
# 12k, exactly as the base continuation did. The supervisor auto-appends
# resume_from_checkpoint since .scratch/large_q_run has checkpoints.
exec python tools/train_supervised.py config=configs/tiny.yaml \
    general.wandb.run_name=r3e-large-quality \
    tokenizer.losses.perceptual_weight=0.0 \
    general.checkpoints.save_path=.scratch/large_q_run \
    general.checkpoints.host_snapshot_interval=0 \
    general.checkpoints.preemption_save_timeout_s=450 \
    general.checkpoints.save_interval=1000 \
    tokenizer.model.encoder_size=large \
    tokenizer.model.decoder_size=large \
    discriminator.model.model_size=base \
    training.main.remat=true \
    dataset.uint8_wire=true \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.eval.train_probe_dataset=.scratch/wds/train/00000.tar \
    training.eval.train_probe_samples=64 \
    training.main.max_steps=18000
