"""Standalone checkpoint evaluation: run the eval epoch on any checkpoint.

The reference can only score a checkpoint by spinning up the full
Lightning fit/validate machinery (reference ``train.py:130-163``); there
is no offline eval entry point. This CLI loads a saved checkpoint
(weights + EMA-VQ codebook), runs the configured eval dataset through
the jitted eval step, and writes ``eval/*`` metrics (device-side
PSNR/SSIM plus any host-hub metrics like FVD/JEDi whose extractors are
staged) to ``<out>/metrics.jsonl`` — plus side-by-side recon videos.

Usage (same config surface as train.py, plus flags):

    python tools/evaluate.py config=configs/tiny.yaml \
        dataset.eval_dataset=data/eval/{00000..00029}.tar \
        --ckpt out_ckpt            # run dir -> newest step (or a step dir)
    python tools/evaluate.py config=... --ckpt out_ckpt --steps all
        # score every saved step -> post-hoc quality curve
"""

from __future__ import annotations

import argparse
import os
import re
import sys

# allow running as `python tools/<name>.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _honor_platform_env():
    """The axon sitecustomize forces jax_platforms=axon even over an
    explicit JAX_PLATFORMS env var; restore the user's choice."""
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


_honor_platform_env()


def _list_steps(run_dir: str) -> list[int]:
    steps = []
    for name in os.listdir(run_dir):
        if name.isdigit() and os.path.isdir(os.path.join(run_dir, name)):
            steps.append(int(name))
    return sorted(steps)


def _resolve_ckpts(path: str, steps: str) -> list[tuple[int, str]]:
    """(step, checkpoint_dir) pairs for a step dir or a run dir."""
    path = os.path.abspath(path)
    base = os.path.basename(path.rstrip("/"))
    if base.isdigit():  # a single step dir
        return [(int(base), path)]
    if os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")):
        # bare orbax checkpoint (e.g. a tools/save_weights.py artifact);
        # label with trailing digits in the dir name if any
        m = re.search(r"(\d+)$", base)
        return [(int(m.group(1)) if m else 0, path)]
    all_steps = _list_steps(path)
    if not all_steps:
        raise FileNotFoundError(f"no checkpoint step dirs under {path}")
    if steps == "all":
        return [(s, os.path.join(path, str(s))) for s in all_steps]
    if steps == "latest":
        return [(all_steps[-1], os.path.join(path, str(all_steps[-1])))]
    want = int(steps)
    if want not in all_steps:
        raise FileNotFoundError(f"step {want} not in {all_steps}")
    return [(want, os.path.join(path, str(want)))]


def main(argv: list[str]) -> None:
    flags, cfg_args = [], []
    it = iter(argv)
    for a in it:
        if a in ("--ckpt", "--out", "--steps", "--quant", "--token-sweep"):
            flags += [a, next(it)]
        else:
            cfg_args.append(a)
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint step dir, or a run dir (see --steps)")
    ap.add_argument("--out", default=None,
                    help="metrics/videos output dir (default <ckpt>/eval)")
    ap.add_argument("--steps", default="latest",
                    help="'latest' (default), 'all', or a step number — "
                         "for run-dir --ckpt")
    ap.add_argument("--token-sweep", default=None,
                    help="comma-separated latent-token counts (e.g. "
                         "'1,4,16,64,128'): score the eval set once per "
                         "FIXED count instead of the training protocol's "
                         "random draw — the rate-distortion curve over the "
                         "reference's defining 1-128 token axis "
                         "(/root/reference/dataset/video_dataset.py:139-141,"
                         " model/titok.py:54-62). Writes "
                         "<out>/token_sweep.jsonl")
    ap.add_argument("--quant", choices=("w8a16", "w8a8"), default=None,
                    help="score the int8 serving path: quantize the "
                         "restored generator (titok_tpu/serving/quant.py) "
                         "and run the eval epoch through it — the quality "
                         "cost of int8 on a real checkpoint")
    args = ap.parse_args(flags)

    from titok_tpu.config import config_from_cli

    config = config_from_cli(cfg_args)
    # eval needs no loss system: don't require LPIPS weights or build the
    # discriminator optimizer just to score a checkpoint
    config.set_dotted("tokenizer.losses.disc_weight", 0.0)
    config.set_dotted("tokenizer.losses.perceptual_weight", 0.0)
    config.set_dotted("tokenizer.losses.gram_weight", 0.0)
    if not str(config.dataset.train_dataset):
        config.set_dotted("dataset.train_dataset",
                          str(config.dataset.eval_dataset))

    ckpts = _resolve_ckpts(args.ckpt, args.steps)
    out = args.out or os.path.join(os.path.abspath(args.ckpt), "eval")
    config.set_dotted("general.checkpoints.save_path", out)
    config.set_dotted("general.checkpoints.resume_from_checkpoint", None)
    config.set_dotted("general.checkpoints.init_from_checkpoint", None)

    import jax
    import numpy as np

    from titok_tpu.train_utils.checkpoints import restore_weights_only
    from titok_tpu.training.trainer import Trainer

    np.random.seed(int(config.training.main.get("seed", 0)))
    trainer = Trainer(config)
    probe = next(iter(trainer.batches_fn(config, eval=True, seed=0)))
    state = trainer.builder.init_state(
        jax.random.PRNGKey(0), probe.device_arrays(), None
    )
    def run_validate(st, step):
        if args.quant:
            # jit-tracing of the eval step happens inside the interceptor
            # context, so the compiled program runs int8 Dense layers over
            # the quantized tree
            import flax.linen as nn

            from titok_tpu.serving.quant import (
                make_interceptor,
                quantize_params,
            )

            qstate = st.replace(gen_params=quantize_params(st.gen_params))
            with nn.intercept_methods(make_interceptor(args.quant)):
                return trainer.validate(qstate, step)
        return trainer.validate(st, step)

    for step, ckpt_dir in ckpts:
        state = restore_weights_only(ckpt_dir, state)
        if args.token_sweep:
            import json

            counts = [int(x) for x in args.token_sweep.split(",")]
            # per-count epochs need repacked batches, not re-jitted
            # programs: packed shapes are static in seq_len, token counts
            # are data — one compile serves the whole sweep
            trainer.config.set_dotted("training.eval.train_probe_dataset",
                                      None)
            trainer.config.set_dotted("training.eval.log_recon_num", 0)
            os.makedirs(out, exist_ok=True)
            sweep_path = os.path.join(out, "token_sweep.jsonl")
            with open(sweep_path, "a") as f:
                for c in counts:
                    trainer.config.set_dotted(
                        "training.sampling.token_range", [c, c])
                    trainer._eval_cache = None
                    scores = run_validate(state, step) or {}
                    row = {"step": step, "token_count": c,
                           "quant": args.quant,
                           **{k: float(v) for k, v in scores.items()}}
                    f.write(json.dumps(row) + "\n")
                    f.flush()
                    print(f"tokens={c:4d}  " + "  ".join(
                        f"{k}={v:.4g}" for k, v in row.items()
                        if k.startswith("eval/")))
        else:
            run_validate(state, step)


if __name__ == "__main__":
    main(sys.argv[1:])
