"""Generate a procedural video dataset for training runs in the zero-egress
environment (no real corpus like UCF-101 can be staged here).

Clips have real video structure — temporally coherent motion, textures,
occlusion — so reconstruction quality metrics behave like they do on
natural video (a tokenizer must actually model motion to reconstruct
them), unlike iid-noise synthetic batches:

- moving Gaussian blobs with per-blob velocity + color
- drifting sinusoidal plaids (orientation, frequency, phase velocity)
- a global affine-drifting background gradient
- light sensor noise

Usage:
    python tools/gen_dataset.py out_dir --num 120 --seed 0
    python -m titok_tpu.data.convert_to_wds out_dir shard_dir   # optional
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_clip(rng: np.random.Generator, t: int, h: int, w: int) -> np.ndarray:
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    out = np.empty((t, h, w, 3), np.float32)

    # background gradient with drift
    g_dir = rng.normal(size=(2,))
    g_dir /= np.linalg.norm(g_dir) + 1e-6
    g_vel = rng.uniform(-0.01, 0.01, size=2)
    base_col = rng.uniform(0.2, 0.8, size=(3,))

    # plaid texture
    n_waves = rng.integers(1, 3)
    waves = [(rng.uniform(2, 12, size=2), rng.uniform(0, 2 * np.pi),
              rng.uniform(-0.3, 0.3), rng.uniform(0.05, 0.25),
              rng.uniform(0, 1, size=3)) for _ in range(n_waves)]

    # moving blobs
    n_blobs = rng.integers(2, 6)
    blobs = [(rng.uniform(0, 1, size=2), rng.uniform(-0.02, 0.02, size=2),
              rng.uniform(0.03, 0.18), rng.uniform(0, 1, size=3))
             for _ in range(n_blobs)]

    for ti in range(t):
        img = np.tile(base_col, (h, w, 1)).astype(np.float32)
        gx = (xx + g_vel[1] * ti) * g_dir[1] + (yy + g_vel[0] * ti) * g_dir[0]
        img += 0.25 * gx[..., None].astype(np.float32)
        for freq, phase, pvel, amp, col in waves:
            s = np.sin(2 * np.pi * (freq[0] * yy + freq[1] * xx)
                       + phase + pvel * ti)
            img += amp * s[..., None] * col
        for (pos, vel, rad, col) in blobs:
            cy = (pos[0] + vel[0] * ti) % 1.0
            cx = (pos[1] + vel[1] * ti) % 1.0
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            m = np.exp(-d2 / (2 * rad**2))
            img = img * (1 - 0.9 * m[..., None]) + 0.9 * m[..., None] * col
        img += rng.normal(0, 0.01, size=img.shape)
        out[ti] = img
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def main():
    from titok_tpu.data.video_reader import encode_video

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--num", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-frames", type=int, default=48)
    ap.add_argument("--max-frames", type=int, default=96)
    ap.add_argument("--min-size", type=int, default=160)
    ap.add_argument("--max-size", type=int, default=224)
    ap.add_argument("--fps", type=float, default=8.0)
    ap.add_argument("--csv", default=None,
                    help="also write a CSV manifest at this path")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    paths = []
    for i in range(args.num):
        t = int(rng.integers(args.min_frames, args.max_frames + 1))
        h = int(rng.integers(args.min_size, args.max_size + 1))
        w = int(rng.integers(args.min_size, args.max_size + 1))
        clip = synth_clip(rng, t, h, w)
        p = os.path.join(args.out_dir, f"clip_{i:05d}.mp4")
        encode_video(p, clip, fps=args.fps, codec="mpeg4")
        paths.append(p)
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{args.num}")
    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            wr = csv.DictWriter(f, fieldnames=["path"])
            wr.writeheader()
            for p in paths:
                wr.writerow({"path": p})
    print(f"wrote {len(paths)} clips to {args.out_dir}")


if __name__ == "__main__":
    main()
