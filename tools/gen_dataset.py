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

Two render paths:

- default (fast): float32, vectorized over time — ~6× faster on this
  1-core host. Layer PARAMETERS are drawn from the rng in the same
  order as the exact path, but rendering precision (f32 vs f64) and the
  sensor-noise draw differ, so pixels are distribution-identical, not
  byte-identical, to pre-round-4 corpora. Use for TRAIN corpora.
- --exact: the original per-frame f64 implementation, byte-identical to
  the generator that produced every round-2/3 corpus. Use to regenerate
  the FROZEN EVAL SET (docs/eval_set/) so held-out metrics stay
  comparable across rounds (round-3 verdict weak #4).

Usage:
    python tools/gen_dataset.py out_dir --num 120 --seed 0
    python tools/gen_dataset.py out_dir --num 160 --seed 777 --exact
    python -m titok_tpu.data.convert_to_wds out_dir shard_dir   # optional
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _draw_params(rng: np.random.Generator):
    """Draw one clip's layer parameters.

    The draw ORDER is shared by both render paths (and matches the
    pre-round-4 generator), so a given seed yields the same scene
    script either way; only rendering precision differs.
    """
    p = {}
    p["use_camera"] = rng.random() < 0.45
    p["use_plaid"] = (not p["use_camera"]) or rng.random() < 0.3
    p["use_rects"] = rng.random() < 0.5
    p["use_blobs"] = (not p["use_rects"]) or rng.random() < 0.5
    p["use_flicker"] = rng.random() < 0.3

    g_dir = rng.normal(size=(2,))
    g_dir /= np.linalg.norm(g_dir) + 1e-6
    p["g_dir"] = g_dir
    p["g_vel"] = rng.uniform(-0.01, 0.01, size=2)
    p["base_col"] = rng.uniform(0.2, 0.8, size=(3,))

    if p["use_camera"]:
        n = 24
        p["tex_freq"] = rng.uniform(1.0, 18.0, size=(n, 2))
        p["tex_phase"] = rng.uniform(0, 2 * np.pi, size=(n,))
        p["tex_amp"] = rng.uniform(0.02, 0.14, size=(n,)) / np.sqrt(n / 8.0)
        p["tex_col"] = rng.uniform(-1, 1, size=(n, 3))
        p["tex_base"] = rng.uniform(0.3, 0.7, size=(3,))
        p["pan_v"] = rng.uniform(-0.015, 0.015, size=2)
        p["zoom_v"] = rng.uniform(-0.008, 0.008)
        p["rot_v"] = rng.uniform(-0.02, 0.02)
        p["cy0"], p["cx0"] = rng.uniform(0.3, 0.7, size=2)

    p["waves"] = []
    if p["use_plaid"]:
        n_waves = rng.integers(1, 3)
        p["waves"] = [(rng.uniform(2, 12, size=2), rng.uniform(0, 2 * np.pi),
                       rng.uniform(-0.3, 0.3), rng.uniform(0.05, 0.25),
                       rng.uniform(0, 1, size=3)) for _ in range(n_waves)]

    p["blobs"] = []
    if p["use_blobs"]:
        n_blobs = rng.integers(2, 6)
        p["blobs"] = [(rng.uniform(0, 1, size=2),
                       rng.uniform(-0.02, 0.02, size=2),
                       rng.uniform(0.03, 0.18), rng.uniform(0, 1, size=3))
                      for _ in range(n_blobs)]

    p["rects"] = []
    if p["use_rects"]:
        n_rects = rng.integers(1, 4)
        p["rects"] = [(rng.uniform(0.1, 0.9, size=2),
                       rng.uniform(-0.02, 0.02, size=2),
                       rng.uniform(0.06, 0.25, size=2), rng.uniform(0, np.pi),
                       rng.uniform(-0.06, 0.06), rng.uniform(0, 1, size=3))
                      for _ in range(n_rects)]

    p["flick_f"] = rng.uniform(0.05, 0.4)
    p["flick_a"] = rng.uniform(0.05, 0.15)
    return p


def synth_clip(rng: np.random.Generator, t: int, h: int, w: int) -> np.ndarray:
    """Fast path: float32, vectorized over time, CHANNEL-MAJOR buffers.

    ~6× faster than the exact path on one core. The hot loops operate
    on contiguous [T,H,W] per-channel planes with preallocated
    temporaries — the naive [T,H,W,3] broadcast version spends ~0.1 s
    per layer op just on 4-channel temporaries (measured), which is
    slower than the per-frame original. Scene parameters come from the
    shared `_draw_params` stream; sensor noise is drawn as one f32
    block (different stream consumption than the exact path).
    """
    f32 = np.float32
    p = _draw_params(rng)
    yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=f32),
                         np.linspace(0, 1, w, dtype=f32), indexing="ij")
    tt = np.arange(t, dtype=f32)[:, None, None]  # [T,1,1]
    two_pi = f32(2 * np.pi)

    img = np.empty((3, t, h, w), f32)   # channel-major render target
    tmp = np.empty((t, h, w), f32)      # reused scratch plane

    if p["use_camera"]:
        z = np.exp(f32(p["zoom_v"]) * tt)
        th = f32(p["rot_v"]) * tt
        c, s = np.cos(th), np.sin(th)
        u = (yy - f32(0.5)) * z
        v = (xx - f32(0.5)) * z
        pan = p["pan_v"].astype(f32)
        sy = c * u - s * v + f32(p["cy0"]) + pan[0] * tt
        sx = s * u + c * v + f32(p["cx0"]) + pan[1] * tt
        base = p["tex_base"].astype(f32)
        for ch in range(3):
            img[ch].fill(base[ch])
        freq = p["tex_freq"].astype(f32)
        phase = p["tex_phase"].astype(f32)
        amp = p["tex_amp"].astype(f32)
        col = p["tex_col"].astype(f32)
        for i in range(freq.shape[0]):
            np.multiply(sy, freq[i, 0] * two_pi, out=tmp)
            tmp += (two_pi * freq[i, 1]) * sx
            tmp += phase[i]
            np.sin(tmp, out=tmp)
            tmp *= amp[i]
            for ch in range(3):
                img[ch] += col[i, ch] * tmp
    else:
        base = p["base_col"].astype(f32)
        g_dir = p["g_dir"].astype(f32)
        g_vel = p["g_vel"].astype(f32)
        gx = ((xx + g_vel[1] * tt) * g_dir[1] + (yy + g_vel[0] * tt) * g_dir[0])
        for ch in range(3):
            img[ch].fill(base[ch])
            img[ch] += f32(0.25) * gx

    for freq, phase, pvel, amp, col in p["waves"]:
        freq = freq.astype(f32)
        np.add((two_pi * freq[0]) * yy + (two_pi * freq[1]) * xx + f32(phase),
               f32(pvel) * tt, out=tmp)
        sv = np.sin(tmp, out=tmp)
        sv *= f32(amp)
        colf = col.astype(f32)
        for ch in range(3):
            img[ch] += colf[ch] * sv
    for (pos, vel, rad, col) in p["blobs"]:
        cy = (f32(pos[0]) + f32(vel[0]) * tt) % f32(1.0)
        cx = (f32(pos[1]) + f32(vel[1]) * tt) % f32(1.0)
        np.subtract(yy, cy, out=tmp)
        np.multiply(tmp, tmp, out=tmp)
        d2x = xx - cx
        d2x *= d2x
        tmp += d2x
        tmp *= f32(-1.0 / (2 * rad**2))
        np.exp(tmp, out=tmp)            # m in [0,1]
        colf = col.astype(f32)
        m9 = tmp
        m9 *= f32(0.9)                  # 0.9*m
        for ch in range(3):
            img[ch] *= (f32(1.0) - m9)
            img[ch] += colf[ch] * m9
    for (pos, vel, half, ang0, avel, col) in p["rects"]:
        cy = (f32(pos[0]) + f32(vel[0]) * tt) % f32(1.0)
        cx = (f32(pos[1]) + f32(vel[1]) * tt) % f32(1.0)
        th = f32(ang0) + f32(avel) * tt
        c, s = np.cos(th), np.sin(th)
        dy, dx = yy - cy, xx - cx
        m = (np.abs(c * dy - s * dx) < f32(half[0]))
        m &= (np.abs(s * dy + c * dx) < f32(half[1]))
        colf = col.astype(f32)
        for ch in range(3):
            img[ch][m] = colf[ch]
    if p["use_flicker"]:
        flick = (f32(1.0) + f32(p["flick_a"])
                 * np.sin(two_pi * f32(p["flick_f"]) * tt))
        for ch in range(3):
            img[ch] *= flick
    noise = rng.standard_normal((3, t, h, w), dtype=f32)
    noise *= f32(0.01)
    img += noise
    np.clip(img, 0, 1, out=img)
    img *= f32(255.0)
    out = np.empty((t, h, w, 3), np.uint8)
    for ch in range(3):
        out[..., ch] = img[ch]
    return out


def _fourier_texture_exact(rng_draws, n: int = 24):
    freq, phase, amp, col, base = rng_draws

    def sample(yy, xx):
        img = np.tile(base.astype(np.float32), (*yy.shape, 1))
        for i in range(n):
            s = np.sin(2 * np.pi * (freq[i, 0] * yy + freq[i, 1] * xx)
                       + phase[i]).astype(np.float32)
            img += amp[i] * s[..., None] * col[i]
        return img

    return sample


def synth_clip_exact(rng: np.random.Generator, t: int, h: int,
                     w: int) -> np.ndarray:
    """Exact path: per-frame f64 math, byte-identical to the pre-round-4
    generator (rounds 2-3 corpora). Used to regenerate the frozen eval
    set; ~6× slower than `synth_clip`."""
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    yy = yy.astype(np.float32)
    xx = xx.astype(np.float32)
    out = np.empty((t, h, w, 3), np.float32)

    p = _draw_params(rng)
    use_camera = p["use_camera"]
    waves, blobs, rects = p["waves"], p["blobs"], p["rects"]
    g_dir, g_vel, base_col = p["g_dir"], p["g_vel"], p["base_col"]
    if use_camera:
        tex = _fourier_texture_exact((p["tex_freq"], p["tex_phase"],
                                      p["tex_amp"], p["tex_col"],
                                      p["tex_base"]))
        pan_v, zoom_v = p["pan_v"], p["zoom_v"]
        rot_v, cy0, cx0 = p["rot_v"], p["cy0"], p["cx0"]
    flick_f, flick_a = p["flick_f"], p["flick_a"]

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
        if p["use_flicker"]:
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
    ap.add_argument("--exact", action="store_true",
                    help="byte-identical pre-round-4 renderer (slow); "
                         "required when regenerating the frozen eval set")
    ap.add_argument("--csv", default=None,
                    help="also write a CSV manifest at this path")
    ap.add_argument("--offset", type=int, default=0,
                    help="start clip numbering here (top up an interrupted "
                         "generation without redoing existing clips; use a "
                         "fresh --seed for the topped-up range)")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    render = synth_clip_exact if args.exact else synth_clip
    paths = []
    for i in range(args.num):
        t = int(rng.integers(args.min_frames, args.max_frames + 1))
        h = int(rng.integers(args.min_size, args.max_size + 1))
        w = int(rng.integers(args.min_size, args.max_size + 1))
        clip = render(rng, t, h, w)
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
