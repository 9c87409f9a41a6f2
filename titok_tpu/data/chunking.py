"""Clip chunk sampling: native-resolution / native-length / variable-fps
training chunks (reference ``dataset/video_dataset.py:38-127``).

Walks a source video front-to-back emitting chunks with random frame count
(multiples of the temporal patch), random fps via index striding, random
H/W (multiples of the spatial patch, aspect-ratio-capped), then
RandomResizedCrop + horizontal flip (train) or Resize + CenterCrop (eval),
exactly as the reference does. Output chunks are **uint8 THWC** — the fused
C++ packer kernel normalizes to [-1, 1] while patchifying, so the float
blowup never materializes on the host.
"""

from __future__ import annotations

import math
import subprocess
from typing import Iterator, Sequence

import numpy as np
from PIL import Image


def _resize_frames_pil(frames: np.ndarray, size_hw: tuple[int, int]) -> np.ndarray:
    """Bicubic resize of uint8 THWC frames via PIL (fallback path)."""
    out = np.empty((frames.shape[0], size_hw[0], size_hw[1], 3), np.uint8)
    for i, f in enumerate(frames):
        out[i] = np.asarray(
            Image.fromarray(f).resize((size_hw[1], size_hw[0]), Image.BICUBIC)
        )
    return out


_NATIVE_RESIZE: bool | None = None  # None = not probed yet


def _resize_frames(frames: np.ndarray, size_hw: tuple[int, int],
                   crop: tuple[int, int, int, int] | None = None) -> np.ndarray:
    """Crop (optional) + bicubic resize of uint8 THWC frames.

    Prefers the fused native libswscale kernel (measured ~6x faster than
    per-frame PIL — the single hottest host stage feeding the TPU); falls
    back to PIL when the native lib can't build."""
    global _NATIVE_RESIZE
    if _NATIVE_RESIZE is not False:
        try:
            from titok_tpu.data.video_reader import resize_frames

            out = resize_frames(frames, size_hw, crop=crop)
            _NATIVE_RESIZE = True
            return out
        except (OSError, ImportError, subprocess.CalledProcessError):
            _NATIVE_RESIZE = False  # lib unavailable/unbuildable
    if crop is not None:
        cy, cx, ch, cw = crop
        frames = frames[:, cy : cy + ch, cx : cx + cw]
    return _resize_frames_pil(frames, size_hw)


def random_resized_crop(
    frames: np.ndarray, out_hw: tuple[int, int], min_scale: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """torchvision RandomResizedCrop with fixed aspect ratio = out ratio
    (reference ``video_dataset.py:100-107``): crop a random-area window of
    the target aspect, resize to target, one crop for the whole clip."""
    T, H, W, _ = frames.shape
    oh, ow = out_hw
    ratio = ow / oh
    area = H * W
    for _ in range(10):
        target_area = area * rng.uniform(min_scale, 1.0)
        cw = int(round(math.sqrt(target_area * ratio)))
        ch = int(round(math.sqrt(target_area / ratio)))
        if 0 < cw <= W and 0 < ch <= H:
            y = int(rng.integers(0, H - ch + 1))
            x = int(rng.integers(0, W - cw + 1))
            return _resize_frames(frames, out_hw, crop=(y, x, ch, cw))
    # fallback: center crop of the largest window with the right ratio
    if W / H > ratio:
        ch, cw = H, int(round(H * ratio))
    else:
        cw, ch = W, int(round(W / ratio))
    y, x = (H - ch) // 2, (W - cw) // 2
    return _resize_frames(frames, out_hw, crop=(y, x, ch, cw))


def resize_center_crop(frames: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Eval path: short side -> max(out), center crop (ref ``:95-98``)."""
    T, H, W, _ = frames.shape
    oh, ow = out_hw
    target = max(oh, ow)
    scale = target / min(H, W)
    nh, nw = max(oh, int(round(H * scale))), max(ow, int(round(W * scale)))
    frames = _resize_frames(frames, (nh, nw))
    y, x = (nh - oh) // 2, (nw - ow) // 2
    return frames[:, y : y + oh, x : x + ow]


def iter_video_chunks(
    reader,
    *,
    patch_size: Sequence[int],
    min_grid: Sequence[int],
    max_grid: Sequence[int],
    fps_range: Sequence[int],
    max_aspect_ratio: float,
    min_scale: float,
    rng: np.random.Generator,
    eval: bool = False,
) -> Iterator[dict]:
    """Yield ``{'video': uint8 THWC, 'fps': int}`` chunks from one video
    (reference ``_video_process`` inner loop, ``video_dataset.py:56-127``)."""
    p0, p1, p2 = patch_size
    in_fps = int(reader.get_avg_fps())
    in_grid = [len(reader), reader.height, reader.width]
    min_fps, max_fps = int(fps_range[0]), int(fps_range[1])

    if not all(x >= y for x, y in zip(in_grid, min_grid)) or in_fps < min_fps:
        return

    start_idx = 0
    while True:
        chunk_num_frames = int(rng.choice(
            np.arange(min_grid[0], max_grid[0] + 1, p0)
        ))
        chunk_fps = int(rng.integers(min_fps, min(max_fps, in_fps) + 1))
        end_idx = start_idx + int(chunk_num_frames * (in_fps / chunk_fps))
        if in_grid[0] < end_idx:
            break

        chunk_height = int(rng.choice(
            np.arange(min_grid[1], min(max_grid[1], in_grid[1]) + 1, p1)
        ))
        width_error = int(chunk_height / max_aspect_ratio) % p2
        min_width = max(min_grid[2], int(chunk_height / max_aspect_ratio) - width_error)
        max_width = min(max_grid[2], in_grid[2], int(chunk_height * max_aspect_ratio))
        if max_width < min_width:
            start_idx = end_idx + 1
            continue
        chunk_width = int(rng.choice(np.arange(min_width, max_width + 1, p2)))

        chunk_indices = np.linspace(
            start_idx, end_idx - 1, chunk_num_frames, dtype=int
        ).tolist()
        frames = reader.get_batch(chunk_indices)  # uint8 THWC

        if eval:
            frames = resize_center_crop(frames, (chunk_height, chunk_width))
        else:
            frames = random_resized_crop(
                frames, (chunk_height, chunk_width), min_scale, rng
            )
            if rng.random() < 0.5:  # horizontal flip
                frames = frames[:, :, ::-1]

        yield {"video": np.ascontiguousarray(frames), "fps": chunk_fps}
        start_idx = end_idx + 1


def chunk_shuffle_buffer(stream, buffer_size: int, rng: np.random.Generator):
    """Reservoir-style shuffle (reference ``video_dataset_csv.py:122-131``)."""
    buffer: list = []
    for sample in stream:
        if len(buffer) < buffer_size:
            buffer.append(sample)
        else:
            idx = int(rng.integers(buffer_size))
            out = buffer[idx]
            buffer[idx] = sample
            yield out
