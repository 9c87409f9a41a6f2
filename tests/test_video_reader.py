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
