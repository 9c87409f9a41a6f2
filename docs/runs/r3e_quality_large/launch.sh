#!/bin/sh
# Round-3e capacity point: LARGE (24L/1024w, 16 heads) tokenizer with
# remat, 12,000 steps — the fourth point in the capacity series
# (tiny r3_quality_1200 / small r3_quality_small / base r3b_quality_base),
# same corpus, sampling, seq budget 6144, GAN recipe, and eval protocol
# (160 held-out clips). Fresh 12k cosine (not a continuation of the
# r3c 2k smoke, whose schedule completed at 2k).
#
# EXECUTED IN ROUND 4 (2026-08-20). Round-4 deltas, none affecting the
# training recipe:
# - corpus regenerated with the round-4 generator: eval set via --exact
#   (byte-identical to the r3b recipe; frozen in docs/eval_set/), train
#   corpus via the fast renderer (distribution-identical, ~6x faster —
#   the serial regen cost is what killed two prior launch attempts).
# - training.eval.train_probe_dataset: train-set rPSNR/rSSIM logged
#   with the held-out protocol (capacity-vs-data-ceiling analysis,
#   round-3 verdict weak #5).
#
# Deltas vs the smaller capacity runs, both forced by scale:
# - discriminator stays BASE: the all-large GAN state is 19.6 GB HBM vs
#   the v5e's 15.75 (see docs/runs/r3c_large_smoke/README.md) — an
#   all-large recipe is a multi-chip/FSDP job.
# - dataset.uint8_wire=true: halves H2D bytes and thus the relay
#   client's host-memory leak rate over a ~4 h run; input quantization
#   is <=1/255 on frames that originate as uint8 mp4 decode.
#
# LPIPS off (perceptual_weight=0.0) — no pretrained VGG on this image.
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
    training.main.max_steps=12000
