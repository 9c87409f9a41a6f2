"""Plot rate-distortion curves from tools/evaluate.py --token-sweep output.

PSNR and SSIM vs latent-token count (log2 x-axis), one series per run,
as two stacked panels — two measures of different scale never share an
axis. Same visual system as tools/plot_run.py: fixed-slot categorical
palette, thin 2px lines + >=8px markers, recessive grid, direct end
labels.

Usage:
    python tools/plot_token_sweep.py out.png \
        large-18k=.scratch/sweep_large18k/token_sweep.jsonl \
        tiny-lpips-5k=.scratch/sweep_tiny_lpips/token_sweep.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plot_run import GRID, SERIES, SURFACE, TEXT, TEXT_2  # noqa: E402


def load_sweep(path: str) -> list[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    # last occurrence per count wins (re-runs append)
    by_count = {}
    for r in rows:
        if "token_count" in r:
            by_count[int(r["token_count"])] = r
    return [by_count[c] for c in sorted(by_count)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("runs", nargs="+", help="name=path/to/token_sweep.jsonl")
    ap.add_argument("--baseline", type=float, default=None,
                    help="horizontal reference line on the PSNR panel "
                         "(e.g. the random-draw protocol's best)")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [("eval/psnr", "rPSNR (dB)"), ("eval/ssim", "SSIM")]
    fig, axes = plt.subplots(2, 1, figsize=(7.2, 6.4), dpi=144, sharex=True)
    fig.patch.set_facecolor(SURFACE)

    runs = [r.split("=", 1) for r in args.runs]
    for ax, (metric, ylabel) in zip(axes, panels):
        ax.set_facecolor(SURFACE)
        for slot, (name, path) in enumerate(runs):
            rows = [r for r in load_sweep(path) if metric in r]
            xs = [r["token_count"] for r in rows]
            ys = [r[metric] for r in rows]
            color = SERIES[slot % len(SERIES)]
            ax.plot(xs, ys, color=color, lw=2, marker="o", ms=5,
                    markerfacecolor=color,
                    markeredgecolor=SURFACE, markeredgewidth=1)
            if xs:  # direct end label
                ax.annotate(f" {name}", (xs[-1], ys[-1]), color=TEXT,
                            fontsize=8.5, va="center")
        if metric == "eval/psnr" and args.baseline is not None:
            ax.axhline(args.baseline, color=TEXT_2, lw=1, ls=(0, (4, 3)))
            ax.annotate(f" random-draw best {args.baseline:.2f}",
                        (1, args.baseline), color=TEXT_2, fontsize=8,
                        va="bottom")
        ax.set_xscale("log", base=2)
        ax.set_xticks([1, 4, 16, 64, 128])
        ax.get_xaxis().set_major_formatter(
            matplotlib.ticker.ScalarFormatter())
        ax.set_ylabel(ylabel, color=TEXT_2, fontsize=9)
        ax.grid(True, color=GRID, lw=0.75)
        ax.tick_params(colors=TEXT_2, labelsize=8.5)
        for s in ax.spines.values():
            s.set_visible(False)
        ax.margins(x=0.12)
    axes[1].set_xlabel("latent tokens per clip", color=TEXT_2, fontsize=9)
    axes[0].set_title("Rate-distortion over the 1-128 token axis "
                      "(frozen eval set)", color=TEXT, fontsize=10.5,
                      loc="left")
    if len(runs) > 1:
        axes[0].legend([n for n, _ in runs], loc="lower right", fontsize=8.5,
                       frameon=False, labelcolor=TEXT)
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
