"""Tokenizer serving CLI: encode videos to token ids / decode back.

The reference exposes encode/decode only as library calls (SURVEY.md §3.4);
this CLI wraps the same public API for batch/offline use:

    # videos -> per-clip token files (.npz with indices + grid + fps)
    python tools/tokenize.py encode --ckpt out_ckpt/5000 \
        --config configs/tiny.yaml video1.mp4 video2.mp4 --out tokens/

    # token files -> reconstructed videos
    python tools/tokenize.py decode --ckpt out_ckpt/5000 \
        --config configs/tiny.yaml tokens/video1.npz --out recon/

Clips are chunked to the config's sampling grid; encoding packs as many
clips per device batch as fit the eval seq budget.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running as `python tools/<name>.py` from the repo root: python puts
# tools/ on sys.path, not the cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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


def _load_model(config_path: str, ckpt: str | None, token_count: int,
                overrides: list[str] | None = None):
    from titok_tpu.config import load_config
    from titok_tpu.models.titok import TiTokModel, make_titok

    cfg = load_config(config_path, overrides)
    module = make_titok(cfg)
    model = TiTokModel(
        module,
        seq_len=int(cfg.training.sampling.eval_seq_len),
        min_grid=cfg.training.sampling.min_grid,
    )
    if ckpt:
        import jax
        import orbax.checkpoint as ocp

        path = os.path.abspath(ckpt)
        if os.path.isdir(os.path.join(path, "default")):
            path = os.path.join(path, "default")
        from titok_tpu.train_utils.checkpoints import restore_raw

        restored = restore_raw(ocp.StandardCheckpointer(), path)
        # accept either a bare param tree or a TrainState-shaped dict
        params = restored.get("gen_params", restored) if isinstance(
            restored, dict) else restored.gen_params
        model.params = jax.tree_util.tree_map(np.asarray, params)
        # EMA-VQ family: the trained codebook is inference state; a
        # checkpoint without it cannot decode indices (ref titok.py:54-62)
        if module.quantizer == "vq":
            from titok_tpu.models.vq import VQState

            vqs = restored.get("vq_state") if isinstance(restored, dict) \
                else getattr(restored, "vq_state", None)
            if not vqs:
                raise RuntimeError(
                    f"checkpoint {path} has no vq_state but the config "
                    "selects quantizer: vq"
                )
            cb = np.asarray(vqs["codebook"], np.float32)
            model.vq_state = VQState(
                codebook=cb,
                ema_counts=np.asarray(vqs["ema_counts"], np.float32),
                ema_sums=np.asarray(vqs["ema_sums"], np.float32),
                # pre-age-tracking checkpoints lack ages; inference never
                # reads them
                ages=np.asarray(
                    vqs.get("ages", np.zeros(cb.shape[0])), np.float32),
            )
    return cfg, model


def _read_clip(path: str, cfg):
    from titok_tpu.data.video_reader import VideoReader

    vr = VideoReader(path)
    ps = cfg.tokenizer.model.patch_size
    max_grid = cfg.training.sampling.max_grid
    t = min((len(vr) // ps[0]) * ps[0], max_grid[0])
    h = min((vr.height // ps[1]) * ps[1], max_grid[1])
    w = min((vr.width // ps[2]) * ps[2], max_grid[2])
    if t == 0 or h == 0 or w == 0:
        raise ValueError(f"{path}: too small for patch size {ps}")
    frames = vr.get_batch(list(range(t)))[:, :h, :w]  # uint8 THWC
    vid = frames.astype(np.float32).transpose(3, 0, 1, 2) / 255 * 2 - 1
    return vid, vr.fps


def encode_cmd(args):
    cfg, model = _load_model(args.config, args.ckpt, args.tokens,
                             args.overrides)
    model = _maybe_quantize(model, args)
    os.makedirs(args.out, exist_ok=True)
    for path in args.inputs:
        vid, fps = _read_clip(path, cfg)
        idx = model.encode([vid], [args.tokens])[0]
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.out, name + ".npz")
        np.savez(out, indices=idx, grid=np.asarray(vid.shape[1:]), fps=fps)
        print(f"{path} -> {out}  ({len(idx)} tokens, grid {vid.shape[1:]})")


def decode_cmd(args):
    from titok_tpu.data.video_reader import encode_video

    cfg, model = _load_model(args.config, args.ckpt, 0, args.overrides)
    model = _maybe_quantize(model, args)
    os.makedirs(args.out, exist_ok=True)
    for path in args.inputs:
        data = np.load(path)
        recon = model.decode_indices([data["indices"]],
                                     grids=[tuple(data["grid"])])[0]
        frames = (
            (np.clip(recon, -1, 1) + 1) / 2 * 255
        ).astype(np.uint8).transpose(1, 2, 3, 0)  # CTHW -> THWC
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.out, name + "_recon.mp4")
        encode_video(out, frames, fps=float(data["fps"]) or 8.0)
        print(f"{path} -> {out}")


def _maybe_quantize(model, args):
    """Serve with per-channel int8 Dense layers (weight-only w8a16 or
    dynamic-activation w8a8, titok_tpu/serving/quant.py)."""
    if getattr(args, "quant", None):
        from titok_tpu.serving.quant import quantize_model

        model = quantize_model(model, mode=args.quant)
    return model


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in [("encode", encode_cmd), ("decode", decode_cmd)]:
        p = sub.add_parser(name)
        p.add_argument("inputs", nargs="+")
        p.add_argument("--config", required=True)
        p.add_argument("--ckpt", default=None)
        p.add_argument("--out", required=True)
        p.add_argument("--quant", choices=("w8a16", "w8a8"), default=None,
                       help="int8-quantize the Dense layers for serving")
        p.add_argument("--set", action="append", default=[],
                       dest="overrides", metavar="KEY=VAL",
                       help="dotted config override, e.g. "
                            "tokenizer.model.encoder_size=large")
        if name == "encode":
            p.add_argument("--tokens", type=int, default=64,
                           help="latent tokens per clip")
        p.set_defaults(fn=fn)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
