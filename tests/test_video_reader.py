"""Native libav decoder/encoder + fused packer kernel tests."""

import os

import numpy as np
import pytest

from titok_tpu.data.video_reader import (
    VideoReader,
    encode_video,
    patchify_normalize,
)
from titok_tpu.ops.patchify import patchify


def _make_clip(rng, t=16, h=48, w=64):
    """Smooth gradient clip (codec-friendly so lossy roundtrip stays close)."""
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(t):
        r = (xx * 255 / w).astype(np.uint8)
        g = (yy * 255 / h).astype(np.uint8)
        b = np.full((h, w), int(i * 255 / t), np.uint8)
        frames.append(np.stack([r, g, b], axis=-1))
    return np.stack(frames)


@pytest.fixture(scope="module")
def clip_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    clip = _make_clip(rng)
    path = str(tmp_path_factory.mktemp("vids") / "clip.mp4")
    encode_video(path, clip, fps=8.0, codec="mpeg4")
    return path, clip


def test_metadata(clip_file):
    path, clip = clip_file
    vr = VideoReader(path)
    assert len(vr) == clip.shape[0]
    assert vr.height == clip.shape[1] and vr.width == clip.shape[2]
    assert abs(vr.get_avg_fps() - 8.0) < 0.1


def test_decode_roundtrip(clip_file):
    path, clip = clip_file
    vr = VideoReader(path)
    out = vr.get_batch(list(range(len(vr))))
    assert out.shape == clip.shape
    err = np.abs(out.astype(np.int32) - clip.astype(np.int32)).mean()
    assert err < 10, f"mean abs err {err}"  # lossy codec tolerance


def test_random_access(clip_file):
    path, clip = clip_file
    vr = VideoReader(path)
    seq = vr.get_batch(list(range(len(vr))))
    # strided and shuffled access must return the same frames
    idx = [12, 0, 7, 3, 15]
    out = vr.get_batch(idx)
    for i, fi in enumerate(idx):
        np.testing.assert_array_equal(out[i], seq[fi])


def test_open_bytes(clip_file):
    path, clip = clip_file
    data = open(path, "rb").read()
    vr = VideoReader(data)
    assert len(vr) == clip.shape[0]
    out = vr.get_batch([0, 5])
    assert out.shape == (2, clip.shape[1], clip.shape[2], 3)


def test_fused_packer_matches_numpy(rng):
    frames = (rng.uniform(0, 255, size=(8, 16, 24, 3))).astype(np.uint8)
    patch = (4, 8, 8)
    fused = patchify_normalize(frames, patch)
    vid = frames.astype(np.float32).transpose(3, 0, 1, 2) / 255 * 2 - 1
    ref = patchify(vid, patch)
    np.testing.assert_allclose(fused, ref, atol=1e-6)


def test_native_resize_matches_pil(rng):
    """Fused sws crop+bicubic resize (native/frame_resize.cpp): visually
    identical to the PIL fallback (different filter taps — tolerance, not
    equality), crop fusion exact vs slice-then-resize."""
    from titok_tpu.data.chunking import _resize_frames_pil
    from titok_tpu.data.video_reader import resize_frames

    from scipy.ndimage import gaussian_filter

    # natural-statistics frames (smooth field): filters agree closely.
    # (iid noise differs more — different bicubic tap layouts beyond
    # Nyquist; on real video clips measured mean |diff| is 0.17/255.)
    frames = gaussian_filter(
        rng.uniform(0, 255, size=(6, 61, 83, 3)), (0, 2, 2, 0)
    ).astype(np.uint8)
    a = resize_frames(frames, (32, 40))
    b = _resize_frames_pil(frames, (32, 40))
    assert a.shape == b.shape == (6, 32, 40, 3)
    d = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert d.mean() < 3 and np.percentile(d, 99) <= 12

    # antialiasing on downscale (reference uses antialias=True): a 1-px
    # checkerboard 2x-downscaled must collapse to uniform mid-gray
    cb = np.indices((64, 64)).sum(0) % 2 * 255
    cbf = np.repeat(cb[:, :, None], 3, 2).astype(np.uint8)[None]
    g = resize_frames(cbf, (32, 32)).astype(np.float64)
    assert abs(g.mean() - 127.5) < 1.0 and g.std() < 2.0

    c1 = resize_frames(frames, (16, 16), crop=(5, 7, 40, 40))
    c2 = resize_frames(np.ascontiguousarray(frames[:, 5:45, 7:47]), (16, 16))
    np.testing.assert_array_equal(c1, c2)

    with pytest.raises(ValueError):
        resize_frames(frames, (16, 16), crop=(50, 0, 40, 40))  # OOB window


def test_chunker_resize_dispatch(rng):
    """chunking._resize_frames prefers the native kernel and produces the
    same shapes as the PIL path through random_resized_crop."""
    from titok_tpu.data import chunking

    frames = (rng.uniform(0, 255, size=(4, 50, 70, 3))).astype(np.uint8)
    out = chunking.random_resized_crop(
        frames, (24, 32), 0.5, np.random.default_rng(0))
    assert out.shape == (4, 24, 32, 3) and out.dtype == np.uint8
    assert chunking._NATIVE_RESIZE in (True, False)
