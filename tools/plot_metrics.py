"""Plot train-loss curves from a run's metrics.jsonl.

Usage: python tools/plot_metrics.py RUN_DIR [KEY ...] [--out OUT.png]

Small reusable harvester for docs/runs/ artifacts (the per-run plots in
docs/runs/*/ were previously produced by ad-hoc /tmp scripts that died
with each VM). Keys default to the generator/discriminator totals +
reconstruction loss; any metrics.jsonl key works.
"""
from __future__ import annotations

import argparse
import json
import os

DEFAULT_KEYS = [
    "train/gen/total_loss",
    "train/gen/recon_loss",
    "train/disc/total_loss",
]


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("keys", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = load(os.path.join(args.run_dir, "metrics.jsonl"))
    keys = args.keys or [k for k in DEFAULT_KEYS if any(k in r for r in rows)]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.2))
    plotted = 0
    for key in keys:
        xs = [r["step"] for r in rows if key in r]
        ys = [r[key] for r in rows if key in r]
        if xs:
            ax.plot(xs, ys, label=key, linewidth=1.2)
            plotted += 1
    if not plotted:
        avail = sorted({k for r in rows for k in r if k != "step"})
        raise SystemExit(
            f"no requested key found in {len(rows)} rows; available: {avail}")
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    out = args.out or os.path.join(args.run_dir, "losses.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({len(rows)} rows, keys={keys})")


if __name__ == "__main__":
    main()
