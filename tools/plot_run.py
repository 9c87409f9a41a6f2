"""Plot training/eval curves from run metrics.jsonl files to a PNG.

Renders one metric across one or more runs as a line chart (identity =
categorical color, fixed slot order; thin 2px lines; recessive grid;
legend + direct end labels). Restart-tolerant: runs recycled by
tools/train_supervised.py append to the same metrics.jsonl, so duplicate
steps keep their FIRST occurrence (pre-recycle value).

Usage:
    python tools/plot_run.py out.png --metric eval/psnr \
        tiny=docs/runs/r3_quality_1200/metrics.jsonl \
        small=docs/runs/r3_quality_small/metrics.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# validated categorical palette, fixed slot order (do not cycle; >4 series
# on one chart should be faceted instead)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100",
          "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e4e3df"


def load_series(path: str, metric: str) -> tuple[list, list]:
    """(steps, values), first occurrence per step (restart-tolerant)."""
    seen = {}
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if metric in rec and rec.get("step") is not None:
                v = float(rec[metric])
                if v == v and abs(v) != float("inf"):  # skip NaN/inf rows
                    seen.setdefault(int(rec["step"]), v)
    steps = sorted(seen)
    return steps, [seen[s] for s in steps]


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output PNG path")
    ap.add_argument("runs", nargs="+", help="label=path/to/metrics.jsonl")
    ap.add_argument("--metric", default="eval/psnr")
    ap.add_argument("--title", default=None)
    ap.add_argument("--ylabel", default=None)
    ap.add_argument("--window", type=int, default=1,
                    help="moving-average window for noisy train metrics")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    labels = []
    for i, spec in enumerate(args.runs):
        label, path = spec.split("=", 1)
        steps, vals = load_series(path, args.metric)
        if not steps:
            print(f"warning: no '{args.metric}' in {path}")
            continue
        if args.window > 1:
            k = args.window
            vals = np.convolve(vals, np.ones(k) / k, mode="valid").tolist()
            steps = steps[k - 1:]
        color = SERIES[i % len(SERIES)]
        ax.plot(steps, vals, color=color, linewidth=2, label=label,
                solid_capstyle="round")
        # direct end label (identity not color-alone)
        ax.annotate(f" {label}", (steps[-1], vals[-1]), color=TEXT,
                    fontsize=9, va="center")
        labels.append(label)

    ax.set_xlabel("step", color=TEXT_2, fontsize=9)
    ax.set_ylabel(args.ylabel or args.metric, color=TEXT_2, fontsize=9)
    if args.title:
        ax.set_title(args.title, color=TEXT, fontsize=11, loc="left")
    ax.grid(True, color=GRID, linewidth=0.75)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=TEXT_2, labelsize=8)
    if len(labels) > 1:
        leg = ax.legend(frameon=False, fontsize=9, loc="lower right")
        for t in leg.get_texts():
            t.set_color(TEXT)
    # headroom so end labels don't clip
    x0, x1 = ax.get_xlim()
    ax.set_xlim(x0, x1 + 0.08 * (x1 - x0))
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
