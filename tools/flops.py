"""Analytic FLOPs / parameter model for the TiTok train step.

Converts measured step times into achieved TFLOP/s and MFU so bench
numbers can be judged against the hardware roofline instead of only
against each other. The model mirrors the live modules:

- transformer core (``models/transformer.py``): fused ``to_qkv`` producing
  q + sigmoid gate + k + v (GQA, no biases), ``out_proj``, GEGLU FFN with
  inner dim ``round32(mult * 2/3 * width)`` (ref ``transformer.py:36-56``);
- encoder/decoder projections (``models/blocks.py``): ``proj_in``/``proj_out``
  with biases (ref ``blocks.py:49,93,103``);
- the GAN step's 6 discriminator forwards batched into one stacked pass
  (``losses/loss_module.py:135-175``): 2 in the generator pass (real is
  ``stop_gradient``'d, fake is differentiated) and 4 in the disc pass
  (real/fake/noised real/noised fake), all differentiated w.r.t. disc
  params.

Matmul FLOPs use the standard 2*M*N*K; backward counts 2x forward (dx and
dW). Attention-score FLOPs are segment-local (flash kernel skips
cross-segment blocks): ``4 * width * sum(seg_len^2)`` per layer per
direction; pass ``avg_seg`` to approximate ``sum(s_i^2) ~= S * avg_seg``.

CLI::

    python tools/flops.py                      # table for the size family
    python tools/flops.py --size base --seq 12288 --step-ms 380.4
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from titok_tpu.models.blocks import MODEL_DIMS, get_model_dims

# bf16 MXU peak of one TPU v5e chip (what bench.py runs on).
V5E_PEAK_TFLOPS = 197.0
# usable HBM reported by the relay's compiler ("Used ... of 15.75G hbm").
V5E_HBM_BYTES = int(15.75 * 1024 ** 3)


def _round32(x: float) -> int:
    return 32 * ((int(x) + 31) // 32)


@dataclass
class StackDims:
    width: int
    layers: int
    q_heads: int
    kv_heads: int
    head_dim: int
    inner: int  # GEGLU inner dim

    @classmethod
    def from_size(cls, model_size: str, mlp_ratio: float = 4.0) -> "StackDims":
        width, layers, (qh, kvh), mult = get_model_dims(model_size,
                                                        mlp_ratio=mlp_ratio)
        return cls(width, layers, qh, kvh, width // qh,
                   _round32(mult * (2.0 / 3.0) * width))


def stack_params(d: StackDims) -> int:
    """Transformer-core parameter count (matmul weights only; norms and the
    scalar mask token are negligible and excluded on purpose)."""
    hd = d.head_dim
    qkv = d.width * (2 * d.q_heads * hd + 2 * d.kv_heads * hd)
    out = d.q_heads * hd * d.width
    ffd = d.width * 2 * d.inner + d.inner * d.width
    return d.layers * (qkv + out + ffd)


def stack_fwd_flops(d: StackDims, seq: int, avg_seg: int) -> float:
    """Forward FLOPs of one packed transformer stack over ``seq`` tokens."""
    dense = 2.0 * seq * stack_params(d)
    # segment-local attention: QK^T and PV, each 2*s_i^2*hd per head pair
    attn = d.layers * 4.0 * d.width * float(seq) * avg_seg
    return dense + attn


def proj_fwd_flops(width: int, patch_dim: int, token_size: int,
                   seq: int) -> float:
    """proj_in + proj_out of one encoder or decoder (upper bound: applied to
    the whole packed buffer, as the live modules do)."""
    return 2.0 * seq * width * (patch_dim + token_size)


@dataclass
class StepFlops:
    gen_fwd: float
    gen_bwd: float
    disc_fwd: float
    disc_bwd: float

    @property
    def total(self) -> float:
        return self.gen_fwd + self.gen_bwd + self.disc_fwd + self.disc_bwd


def train_step_flops(tok_size: str, disc_size: str, seq: int,
                     avg_seg: int = 768, patch=(4, 8, 8), in_ch: int = 3,
                     token_size: int = 5, use_gan: bool = True,
                     mlp_ratio: float = 4.0, remat: bool = False) -> StepFlops:
    """FLOPs of one full train step at packed budget ``seq``.

    Generator: encoder fwd + decoder fwd, backward = 2x forward.
    GAN: 6 disc forwards (stacked pass over 6*seq rows); backward through
    disc(fake) in the gen pass (~2x one fwd) + through all 4 disc-pass
    forwards for weight grads (~2x four fwds).
    ``remat`` adds one recompute-forward to every differentiated pass
    (``training.main.remat`` checkpoints each block).
    """
    td = StackDims.from_size(tok_size, mlp_ratio)
    patch_dim = in_ch * patch[0] * patch[1] * patch[2]
    enc = stack_fwd_flops(td, seq, avg_seg) + proj_fwd_flops(
        td.width, patch_dim, token_size, seq)
    dec = stack_fwd_flops(td, seq, avg_seg) + proj_fwd_flops(
        td.width, patch_dim, token_size, seq)
    gen_fwd = enc + dec
    gen_bwd = (3.0 if remat else 2.0) * gen_fwd

    disc_fwd = disc_bwd = 0.0
    if use_gan:
        dd = StackDims.from_size(disc_size, mlp_ratio)
        one = stack_fwd_flops(dd, seq, avg_seg) + proj_fwd_flops(
            dd.width, patch_dim, 1, seq)
        disc_fwd = 6.0 * one
        r = 1.0 if remat else 0.0
        disc_bwd = (2.0 + r) * one + (2.0 + r) * 4.0 * one
    return StepFlops(gen_fwd, gen_bwd, disc_fwd, disc_bwd)


@dataclass
class StepMem:
    """Peak-HBM estimate of one GAN train step (bytes)."""
    opt_state: int   # f32 master params + moments (OPT_BYTES_PER_PARAM)
    grads: int       # f32 grads for both towers (one-program step)
    bf16_params: int  # compute-dtype weight copies
    activations: int  # remat boundary activations (block inputs)

    @property
    def total(self) -> int:
        return self.opt_state + self.grads + self.bf16_params + self.activations


OPT_BYTES_PER_PARAM = {
    # f32 master + AdamW mu + nu
    "adamw": 12,
    # f32 master + bf16 momentum; factored v_row/v_col are O(rows+cols)
    # and negligible (optimizer.name=adafactor, train_step.py)
    "adafactor": 6,
}


def train_step_mem(tok_size: str, disc_size: str, seq: int,
                   use_gan: bool = True, mlp_ratio: float = 4.0,
                   optimizer: str = "adamw") -> StepMem:
    """Peak-HBM model for the bf16-mixed GAN step with remat.

    Calibrated against the measured OOM of 2026-08-19: all-large
    (tok+disc 24L/1024w) at seq 6144 needs 19.6 GB on a 15.75 GB v5e
    (this model: ~18 GB — XLA temporaries/fragmentation add ~10%);
    large tokenizer + base disc compiles and trains (model: ~13 GB).

    - optimizer state: OPT_BYTES_PER_PARAM[optimizer],
    - grads: 4 B/param for BOTH towers (the fused gen+disc program holds
      both grad trees at some point),
    - bf16 weight copies: 2 B/param,
    - activations under remat: one [rows, width] bf16 residual per
      checkpointed block — gen differentiates encoder+decoder over
      ``seq`` rows each; the disc's packed pass differentiates 6*seq
      stacked rows (losses/loss_module.py one-pass invariant).
    """
    td = StackDims.from_size(tok_size, mlp_ratio)
    gen_params = 2 * stack_params(td)
    disc_params = 0
    act = 2 * td.layers * seq * td.width * 2
    if use_gan:
        dd = StackDims.from_size(disc_size, mlp_ratio)
        disc_params = stack_params(dd)
        act += dd.layers * 6 * seq * dd.width * 2
    p = gen_params + disc_params
    return StepMem(OPT_BYTES_PER_PARAM[optimizer] * p, 4 * p, 2 * p, act)


def report(tok_size: str, disc_size: str, seq: int, avg_seg: int,
           step_ms: float | None, use_gan: bool, remat: bool = False,
           optimizer: str = "adamw") -> str:
    f = train_step_flops(tok_size, disc_size, seq, avg_seg=avg_seg,
                         use_gan=use_gan, remat=remat)
    d = StackDims.from_size(tok_size)
    lines = [
        f"{tok_size}: width={d.width} layers={d.layers} "
        f"params/stack={stack_params(d)/1e6:.1f}M",
        f"  step FLOPs @ seq={seq} (avg_seg={avg_seg}): "
        f"gen {f.gen_fwd/1e12:.3f}T fwd + {f.gen_bwd/1e12:.3f}T bwd"
        + (f", disc {f.disc_fwd/1e12:.3f}T fwd + {f.disc_bwd/1e12:.3f}T bwd"
           if use_gan else "")
        + f" = {f.total/1e12:.3f} TFLOP",
    ]
    if step_ms is not None:
        tps = f.total / (step_ms / 1e3) / 1e12
        lines.append(
            f"  measured {step_ms:.1f} ms/step -> {tps:.1f} TFLOP/s "
            f"achieved, MFU {100.0 * tps / V5E_PEAK_TFLOPS:.1f}% of v5e peak "
            f"({V5E_PEAK_TFLOPS:.0f} bf16 TFLOP/s)")
    m = train_step_mem(tok_size, disc_size, seq, use_gan,
                       optimizer=optimizer)
    gb = 1024.0 ** 3
    fits = "fits" if m.total * 1.1 <= V5E_HBM_BYTES else "EXCEEDS"
    lines.append(
        f"  peak HBM ~{m.total / gb:.1f} GB (opt {m.opt_state / gb:.1f} + "
        f"grads {m.grads / gb:.1f} + bf16 {m.bf16_params / gb:.1f} + "
        f"act {m.activations / gb:.1f}; +~10% XLA temporaries) — "
        f"{fits} one v5e ({V5E_HBM_BYTES / gb:.2f} GB)")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--size", default=None, choices=sorted(MODEL_DIMS),
                    help="tokenizer (and disc) size; default: whole family")
    ap.add_argument("--disc-size", default=None)
    ap.add_argument("--seq", type=int, default=6144)
    ap.add_argument("--avg-seg", type=int, default=768,
                    help="mean packed segment length for the attention term")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured step time -> print TFLOP/s + MFU")
    ap.add_argument("--no-gan", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="count the recompute fwd of checkpointed backwards")
    ap.add_argument("--optimizer", default="adamw",
                    choices=sorted(OPT_BYTES_PER_PARAM),
                    help="optimizer.name for the state-memory term")
    args = ap.parse_args()
    sizes = [args.size] if args.size else sorted(
        MODEL_DIMS, key=lambda s: MODEL_DIMS[s][0])
    for s in sizes:
        print(report(s, args.disc_size or s, args.seq, args.avg_seg,
                     args.step_ms, not args.no_gan, args.remat,
                     optimizer=args.optimizer))


if __name__ == "__main__":
    main()
