"""Generate a procedural video dataset for training runs in the zero-egress
environment (no real corpus like UCF-101 can be staged here).

Clips have real video structure — temporally coherent motion, textures,
occlusion — so reconstruction quality metrics behave like they do on
natural video (a tokenizer must actually model motion to reconstruct
them), unlike iid-noise synthetic batches:

- moving Gaussian blobs with per-blob velocity + color
- drifting sinusoidal plaids (orientation, frequency, phase velocity)
- a global affine-drifting background gradient
- camera motion: pan/zoom/rotate over a random Fourier texture
  (global-motion clips, bilinear-sampled)
- hard-edged rotating rectangles with z-order occlusion
- global lighting flicker
- light sensor noise

Each clip draws a random subset of these layers so the corpus spans
smooth motion, global motion, occlusion boundaries, and high-frequency
texture — variety matters: a small homogeneous corpus saturates a tiny
tokenizer within ~5k steps (round-2 finding).

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


def _fourier_texture(rng: np.random.Generator, n: int = 24):
    """Random sum-of-sinusoids RGB texture, evaluated at arbitrary coords."""
    freq = rng.uniform(1.0, 18.0, size=(n, 2))
    phase = rng.uniform(0, 2 * np.pi, size=(n,))
    amp = rng.uniform(0.02, 0.14, size=(n,)) / np.sqrt(n / 8.0)
    col = rng.uniform(-1, 1, size=(n, 3))
    base = rng.uniform(0.3, 0.7, size=(3,))

    def sample(yy, xx):
        img = np.tile(base.astype(np.float32), (*yy.shape, 1))
        for i in range(n):
            s = np.sin(2 * np.pi * (freq[i, 0] * yy + freq[i, 1] * xx)
                       + phase[i]).astype(np.float32)
            img += amp[i] * s[..., None] * col[i]
        return img

    return sample


def synth_clip(rng: np.random.Generator, t: int, h: int, w: int) -> np.ndarray:
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    yy = yy.astype(np.float32)
    xx = xx.astype(np.float32)
    out = np.empty((t, h, w, 3), np.float32)

    use_camera = rng.random() < 0.45
    use_plaid = (not use_camera) or rng.random() < 0.3
    use_rects = rng.random() < 0.5
    use_blobs = (not use_rects) or rng.random() < 0.5
    use_flicker = rng.random() < 0.3

    # background gradient with drift
    g_dir = rng.normal(size=(2,))
    g_dir /= np.linalg.norm(g_dir) + 1e-6
    g_vel = rng.uniform(-0.01, 0.01, size=2)
    base_col = rng.uniform(0.2, 0.8, size=(3,))

    # camera layer: pan/zoom/rotate trajectory over a Fourier texture
    if use_camera:
        tex = _fourier_texture(rng)
        pan_v = rng.uniform(-0.015, 0.015, size=2)
        zoom_v = rng.uniform(-0.008, 0.008)
        rot_v = rng.uniform(-0.02, 0.02)
        cy0, cx0 = rng.uniform(0.3, 0.7, size=2)

    # plaid texture
    waves = []
    if use_plaid:
        n_waves = rng.integers(1, 3)
        waves = [(rng.uniform(2, 12, size=2), rng.uniform(0, 2 * np.pi),
                  rng.uniform(-0.3, 0.3), rng.uniform(0.05, 0.25),
                  rng.uniform(0, 1, size=3)) for _ in range(n_waves)]

    # moving blobs
    blobs = []
    if use_blobs:
        n_blobs = rng.integers(2, 6)
        blobs = [(rng.uniform(0, 1, size=2), rng.uniform(-0.02, 0.02, size=2),
                  rng.uniform(0.03, 0.18), rng.uniform(0, 1, size=3))
                 for _ in range(n_blobs)]

    # hard-edged rotating rectangles (z-ordered: later ones occlude)
    rects = []
    if use_rects:
        n_rects = rng.integers(1, 4)
        rects = [(rng.uniform(0.1, 0.9, size=2), rng.uniform(-0.02, 0.02, size=2),
                  rng.uniform(0.06, 0.25, size=2), rng.uniform(0, np.pi),
                  rng.uniform(-0.06, 0.06), rng.uniform(0, 1, size=3))
                 for _ in range(n_rects)]

    flick_f = rng.uniform(0.05, 0.4)
    flick_a = rng.uniform(0.05, 0.15)

    for ti in range(t):
        if use_camera:
            z = np.exp(zoom_v * ti)
            th = rot_v * ti
            c, s = np.cos(th), np.sin(th)
            u = (yy - 0.5) * z
            v = (xx - 0.5) * z
            sy = c * u - s * v + cy0 + pan_v[0] * ti
            sx = s * u + c * v + cx0 + pan_v[1] * ti
            img = tex(sy, sx)
        else:
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
        for (pos, vel, half, ang0, avel, col) in rects:
            cy = (pos[0] + vel[0] * ti) % 1.0
            cx = (pos[1] + vel[1] * ti) % 1.0
            th = ang0 + avel * ti
            c, s = np.cos(th), np.sin(th)
            dy, dx = yy - cy, xx - cx
            ry = c * dy - s * dx
            rx = s * dy + c * dx
            m = ((np.abs(ry) < half[0]) & (np.abs(rx) < half[1]))
            img = np.where(m[..., None], col[None, None, :].astype(np.float32),
                           img)
        if use_flicker:
            img *= 1.0 + flick_a * np.sin(2 * np.pi * flick_f * ti)
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
    ap.add_argument("--offset", type=int, default=0,
                    help="start clip numbering here (top up an interrupted "
                         "generation without redoing existing clips; use a "
                         "fresh --seed for the topped-up range)")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    paths = []
    for i in range(args.num):
        t = int(rng.integers(args.min_frames, args.max_frames + 1))
        h = int(rng.integers(args.min_size, args.max_size + 1))
        w = int(rng.integers(args.min_size, args.max_size + 1))
        clip = synth_clip(rng, t, h, w)
        p = os.path.join(args.out_dir, f"clip_{args.offset + i:05d}.mp4")
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
