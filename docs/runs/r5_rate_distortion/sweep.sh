#!/bin/sh
# Token-count rate-distortion sweeps (round 5). Large: the preserved
# best-of-series checkpoint; tiny: the committed r4 artifact.
cd "$(dirname "$0")/../../.."
python tools/evaluate.py --ckpt .scratch/large_q_run_best14000 \
  --out .scratch/sweep_large_best --token-sweep 1,4,16,64,128 \
  config=.scratch/large_q_run/config.yaml \
  training.eval.train_probe_dataset=null
python tools/evaluate.py --ckpt docs/artifacts/r4_tiny_lpips_5000 \
  --out .scratch/sweep_tiny_lpips --token-sweep 1,4,16,64,128 \
  config=docs/runs/r4_tiny_lpips/config.yaml \
  training.eval.train_probe_dataset=null
python tools/plot_token_sweep.py \
  docs/runs/r5_rate_distortion/rate_distortion.png \
  large-14k=.scratch/sweep_large_best/token_sweep.jsonl \
  tiny-lpips-5k=.scratch/sweep_tiny_lpips/token_sweep.jsonl \
  --baseline 18.42
