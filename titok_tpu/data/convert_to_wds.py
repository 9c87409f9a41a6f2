"""Offline tool: pack a video tree into WebDataset-style tar shards
(reference ``dataset/convert_to_wds.py``).

The reference re-encodes via the ffmpeg CLI (h264 crf 23) and writes
512-sample shards with uuid keys through wds.ShardWriter. This version uses
the first-party libav encoder (``titok_tpu/native``): by default it
re-muxes .mp4 inputs byte-for-byte (no quality loss, no CLI dependency) and
re-encodes other containers with the built-in mpeg4 encoder (or any codec
libavcodec provides via ``--codec``).

Usage:
    python -m titok_tpu.data.convert_to_wds IN_DIR OUT_DIR \
        [--shard-size 512] [--codec mpeg4] [--reencode]
"""

from __future__ import annotations

import argparse
import glob
import os
import tarfile
import uuid


def _iter_videos(in_dir: str):
    for ext in ("mp4", "avi", "mkv", "mov", "webm"):
        yield from glob.iglob(os.path.join(in_dir, "**", f"*.{ext}"),
                              recursive=True)


def _transcode(path: str, codec: str) -> bytes:
    """Decode + re-encode to mp4 via the native lib."""
    import tempfile

    import numpy as np

    from titok_tpu.data.video_reader import VideoReader, encode_video

    vr = VideoReader(path)
    frames = vr.get_batch(np.arange(len(vr)))
    with tempfile.NamedTemporaryFile(suffix=".mp4") as tmp:
        encode_video(tmp.name, frames, fps=max(vr.fps, 1.0), codec=codec)
        return open(tmp.name, "rb").read()


class ShardWriter:
    """Minimal wds.ShardWriter: tar shards of N samples, %05d naming."""

    def __init__(self, pattern: str, maxcount: int = 512):
        self.pattern = pattern
        self.maxcount = maxcount
        self.shard = -1
        self.count = 0
        self.tar = None
        self._next_shard()

    def _next_shard(self):
        if self.tar:
            self.tar.close()
        self.shard += 1
        self.count = 0
        path = self.pattern % self.shard
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.tar = tarfile.open(path, "w")

    def write(self, sample: dict):
        if self.count >= self.maxcount:
            self._next_shard()
        key = sample["__key__"]
        for ext, data in sample.items():
            if ext == "__key__":
                continue
            info = tarfile.TarInfo(f"{key}.{ext}")
            info.size = len(data)
            import io

            self.tar.addfile(info, io.BytesIO(data))
        self.count += 1

    def close(self):
        if self.tar:
            self.tar.close()


def convert(in_dir: str, out_dir: str, shard_size: int = 512,
            codec: str = "mpeg4", reencode: bool = False) -> int:
    writer = ShardWriter(os.path.join(out_dir, "%05d.tar"), shard_size)
    n = 0
    for path in _iter_videos(in_dir):
        try:
            if path.endswith(".mp4") and not reencode:
                data = open(path, "rb").read()
            else:
                data = _transcode(path, codec)
            writer.write({"__key__": uuid.uuid4().hex, "mp4": data})
            n += 1
        except Exception as e:
            print(f"skip {path}: {e}")
    writer.close()
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("in_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--shard-size", type=int, default=512)
    ap.add_argument("--codec", default="mpeg4")
    ap.add_argument("--reencode", action="store_true")
    args = ap.parse_args()
    n = convert(args.in_dir, args.out_dir, args.shard_size, args.codec,
                args.reencode)
    print(f"wrote {n} samples")


if __name__ == "__main__":
    main()
