"""Export the tokenizer as self-contained serialized programs (jax.export).

The reference has no serving layer at all (SURVEY.md §1: "no serving
layer"); its public API is library calls into the torch module
(reference ``model/titok.py:47-62``). TPU-natively, serving wants an
**ahead-of-time artifact**: this tool lowers the jitted forward
(encode→quantize→decode) and ``decode_indices`` programs to StableHLO
with the trained weights — and, for the EMA-VQ family, the codebook —
baked in as constants, then serializes them with ``jax.export``. A
serving host deserializes and calls them with **no model code, no flax,
no checkpoint** — only the lightweight numpy packer
(``titok_tpu.data.packing``) to build the fixed-shape batch dict.

Artifacts (a directory):
    forward.jaxexp   batch dict -> (recon_rows [S,P], indices [S])
    decode.jaxexp    (indices [S], batch dict) -> recon_rows [S,P]
    meta.json        seq_len / patch_size / quantizer / in_channels

Usage::

    python tools/export_model.py --config configs/tiny.yaml \
        --ckpt out_ckpt/12000 --out exported/ [--check]

    # serving side
    from tools.export_model import load_exported
    fwd, dec, meta = load_exported("exported/")
    recon_rows, indices = fwd(batch.device_arrays())
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _specs(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), tree
    )


def export_model(module, params, vq_state, example_batch: dict,
                 out_dir: str, platforms=None, quant: str | None = None) -> None:
    """Serialize forward + decode_indices programs for ``module`` with
    ``params`` (and ``vq_state``) embedded as constants. With ``quant``
    (``w8a16``/``w8a8``) the baked weights are per-channel int8 — the
    artifact shrinks ~4x (int8 vs f32 constants) and the programs run
    int8 Dense layers
    (``titok_tpu/serving/quant.py``)."""
    import jax
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    vqs = vq_state or None

    if quant:
        from titok_tpu.serving.quant import quantize_params, quantized_apply

        params = quantize_params(params)

        def _apply(variables, *args, **kw):
            return quantized_apply(module, variables, *args, mode=quant, **kw)
    else:
        _apply = module.apply

    def forward(batch):
        recon, aux = _apply({"params": params}, batch, vqs)
        return recon, aux["indices"]

    def decode(indices, batch):
        return _apply(
            {"params": params}, indices, batch, vqs,
            method=module.decode_indices_packed,
        )

    kw = {"platforms": platforms} if platforms else {}
    batch_specs = _specs(example_batch)
    idx_spec = jax.ShapeDtypeStruct(
        (example_batch["segment_ids"].shape[0],), np.int32
    )
    exp_fwd = jexport.export(jax.jit(forward), **kw)(batch_specs)
    exp_dec = jexport.export(jax.jit(decode), **kw)(idx_spec, batch_specs)
    with open(os.path.join(out_dir, "forward.jaxexp"), "wb") as f:
        f.write(exp_fwd.serialize())
    with open(os.path.join(out_dir, "decode.jaxexp"), "wb") as f:
        f.write(exp_dec.serialize())
    from titok_tpu.models.blocks import HEAD_DIM

    meta = {
        "seq_len": int(example_batch["segment_ids"].shape[0]),
        # the exported programs have these shapes BAKED; a serving host
        # must pack with exactly this max_samples/head_dim (tools/serve.py)
        "max_samples": int(example_batch["token_counts"].shape[0]),
        "head_dim": int(HEAD_DIM),
        "patch_size": list(module.patch_size),
        "in_channels": int(module.in_channels),
        "quantizer": str(module.quantizer),
        "platforms": list(platforms) if platforms else None,
        "quant": quant,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_exported(out_dir: str):
    """Deserialize the artifacts -> (forward_fn, decode_fn, meta).

    Needs only jax — no model code, weights, or config."""
    from jax import export as jexport

    def _load(name):
        with open(os.path.join(out_dir, name), "rb") as f:
            return jexport.deserialize(f.read()).call

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    return _load("forward.jaxexp"), _load("decode.jaxexp"), meta


def main() -> None:
    from tools.tokenize import _load_model

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu "
                         "(default: current backend)")
    ap.add_argument("--check", action="store_true",
                    help="deserialize and compare against the live module "
                         "on a random batch")
    ap.add_argument("--quant", choices=("w8a16", "w8a8"), default=None,
                    help="bake per-channel int8 weights (weight-only or "
                         "dynamic-activation int8 matmuls)")
    ap.add_argument("--set", action="append", default=[],
                    dest="overrides", metavar="KEY=VAL",
                    help="dotted config override, e.g. "
                         "tokenizer.model.encoder_size=large")
    args = ap.parse_args()

    cfg, model = _load_model(args.config, args.ckpt, 0, args.overrides)
    example = model._dummy_batch()
    platforms = args.platforms.split(",") if args.platforms else None
    export_model(model.module, model.params, model.vq_state, example,
                 args.out, platforms=platforms, quant=args.quant)
    sizes = {n: os.path.getsize(os.path.join(args.out, n))
             for n in ("forward.jaxexp", "decode.jaxexp")}
    print(f"exported to {args.out}: " + ", ".join(
        f"{n} ({s/1e6:.1f} MB)" for n, s in sizes.items()))

    if args.check:
        if args.quant:
            from titok_tpu.serving.quant import quantize_model

            model = quantize_model(model, mode=args.quant)
        fwd, dec, _ = load_exported(args.out)
        recon, idx = fwd(example)
        ref_recon, ref_aux = model._jit_forward(
            model.params, model.vq_state, example
        )
        np.testing.assert_array_equal(np.asarray(idx),
                                      np.asarray(ref_aux["indices"]))
        np.testing.assert_allclose(
            np.asarray(recon, np.float32),
            np.asarray(ref_recon, np.float32), rtol=1e-5, atol=1e-5,
        )
        rec2 = dec(idx, example)
        assert np.asarray(rec2).shape == np.asarray(recon).shape
        print("check ok: exported programs match the live module")


if __name__ == "__main__":
    main()
