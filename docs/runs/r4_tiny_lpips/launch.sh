#!/bin/sh
# Round-4: first run on the reference's FULL training objective shape —
# L1 + perceptual (LPIPS+Gram pathway) + relativistic GAN. Every prior
# committed run trained with perceptual_weight=0 (round-3 verdict "do
# this" #5); this run turns the LPIPS tower ON.
#
# No pretrained VGG exists on this zero-egress image (BASELINE.md), so
# the run uses the SEEDED-RANDOM VGG fallback
# (tokenizer.losses.allow_random_lpips=true) — random conv features are
# a known-useful perceptual metric family, but this is explicitly NOT
# the reference's pretrained perceptual loss; the claim made by this run
# is that the full loss mix (reference loss_module.py:111-163 semantics:
# sampled-frame perceptual term at 128px + Gram + GAN) trains stably on
# chip at the reference's weights (perceptual_weight=1.0, disc 0.4),
# not quality parity.
#
# TINY tokenizer, 5,000 steps on the frozen-corpus recipe (same corpus +
# eval protocol as the capacity series, docs/eval_set/). The LPIPS
# tower makes this the heaviest remote compile attempted after
# all-large (round-1 attempt wedged the relay; round-3's 27-min
# all-large compile succeeded — launch under the supervisor and poll).
#
# steps_per_call=8: first PRODUCTION run of the K-step scan path on the
# relay — lax.scan compiles the step body once (compile cost ~= K=1)
# and amortizes the per-dispatch relay RTT that dominates tiny-config
# steps (0.33 s/step production vs 48 ms on-chip, round-3 numbers).
exec python tools/train_supervised.py config=configs/tiny.yaml \
    general.wandb.run_name=r4-tiny-lpips \
    tokenizer.losses.perceptual_weight=1.0 \
    tokenizer.losses.allow_random_lpips=true \
    general.checkpoints.save_path=.scratch/lpips_run \
    general.checkpoints.host_snapshot_interval=0 \
    general.checkpoints.preemption_save_timeout_s=450 \
    general.checkpoints.save_interval=1000 \
    dataset.uint8_wire=true \
    training.main.steps_per_call=8 \
    "dataset.train_dataset=.scratch/wds/train/{00000..00018}.tar" \
    "dataset.eval_dataset=.scratch/wds/eval/{00000..00002}.tar" \
    training.eval.train_probe_dataset=.scratch/wds/train/00000.tar \
    training.eval.train_probe_samples=64 \
    training.main.max_steps=5000
