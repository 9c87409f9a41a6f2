"""WebDataset-style tar-shard pipeline, first-party
(reference ``dataset/video_dataset.py`` built on the webdataset package).

Reproduces the reference pipeline stages (``video_dataset.py:188-204``):

    ResampledShards -> split_by_worker -> tarfile_to_samples -> shuffle(8)
    -> video_process -> shuffle(64) -> dynamic_batching        (train)
    SimpleShardList -> split_by_worker -> tarfile_to_samples
    -> video_process -> dynamic_batching                        (eval)

with a small self-contained implementation: brace expansion for shard
specs, tar member grouping by key (basename up to the first dot), warn-and-
continue error handling. Remote ``hf://`` shard URLs require network egress
and are rejected with a clear error in this zero-egress build.
"""

from __future__ import annotations

import os
import re
import tarfile
from typing import Iterator

import numpy as np

from titok_tpu.data.chunking import chunk_shuffle_buffer, iter_video_chunks
from titok_tpu.data.packing import PackedBatch, Packer, wire_dtype
from titok_tpu.data.video_reader import VideoReader

_BRACE_RE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def expand_shards(spec: str) -> list[str]:
    """webdataset brace expansion: ``shard-{00000..00079}.tar``."""
    m = _BRACE_RE.search(spec)
    if not m:
        return [spec]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    out = []
    for i in range(int(lo), int(hi) + 1):
        out.extend(expand_shards(spec[: m.start()] + str(i).zfill(width)
                                 + spec[m.end():]))
    return out


def tarfile_to_samples(path: str) -> Iterator[dict]:
    """Group tar members by key -> {'__key__', '<ext>': bytes, ...}."""
    with tarfile.open(path, "r|*") as tf:
        current_key = None
        sample: dict = {}
        for member in tf:
            if not member.isfile():
                continue
            name = os.path.basename(member.name)
            key, _, ext = name.partition(".")
            if key != current_key:
                if sample:
                    yield sample
                current_key = key
                sample = {"__key__": key}
            data = tf.extractfile(member)
            if data is not None:
                sample[ext] = data.read()
        if sample:
            yield sample


def _sample_stream(shards: list[str], rng: np.random.Generator,
                   resample: bool) -> Iterator[dict]:
    """ResampledShards (infinite, random with replacement) or one epoch."""
    for s in shards:
        if s.startswith(("hf://", "http://", "https://")):
            raise ValueError(
                f"remote shard {s!r} needs network egress; stage shards "
                "locally (see tools in titok_tpu/data/convert_to_wds.py)"
            )
    while True:
        order = (rng.permutation(len(shards)) if not resample
                 else rng.integers(0, len(shards), size=len(shards)))
        for i in order:
            try:
                yield from tarfile_to_samples(shards[int(i)])
            except Exception as error:  # warn_and_continue (ref :191-194)
                print(f"shard read fail ({shards[int(i)]}): {error}")
        if not resample:
            return


def _video_chunks(samples: Iterator[dict], sampling, patch_size, rng,
                  eval: bool) -> Iterator[dict]:
    for sample in samples:
        video_keys = [k for k in sample
                      if k == "mp4" or k.endswith(".mp4") or k == "avi"]
        for vk in video_keys:
            try:
                reader = VideoReader(sample[vk])
                yield from iter_video_chunks(
                    reader,
                    patch_size=patch_size,
                    min_grid=sampling.min_grid,
                    max_grid=sampling.max_grid,
                    fps_range=sampling.fps_range,
                    max_aspect_ratio=sampling.max_aspect_ratio,
                    min_scale=float(sampling.get("min_scale", 0.25)),
                    rng=rng,
                    eval=eval,
                )
            except Exception as error:
                print(f"Decode fail: {error}")


def wds_batches(config, eval: bool = False, seed: int = 0) -> Iterator[PackedBatch]:
    cs = config.training.sampling
    patch_size = list(config.tokenizer.model.patch_size)
    rng = np.random.default_rng(seed)

    spec = (config.dataset.eval_dataset if eval
            else config.dataset.train_dataset)
    shards = expand_shards(spec)

    workers = min(int(config.dataset.get("workers", 0) or 0), len(shards))
    if workers >= 1:
        # split_by_worker + N decode threads (ref video_dataset.py:190,210-214)
        # with a deterministic round-robin merge; each worker owns the shard
        # slice shards[w::workers] and an independent rng stream.
        from titok_tpu.data.workers import WorkerPool, worker_seeds

        seeds = worker_seeds(seed, workers)

        def factory(w):
            def stream():
                wrng = np.random.default_rng(seeds[w])
                s = _sample_stream(shards[w::workers], wrng, resample=not eval)
                if not eval:
                    s = chunk_shuffle_buffer(s, 8, wrng)
                return _video_chunks(s, cs, patch_size, wrng, eval)

            return stream

        chunks = iter(WorkerPool([factory(w) for w in range(workers)]))
    else:
        samples = _sample_stream(shards, rng, resample=not eval)
        if not eval:
            samples = chunk_shuffle_buffer(samples, 8, rng)  # wds.shuffle(8)
        chunks = _video_chunks(samples, cs, patch_size, rng, eval)
    if eval:
        max_samples = int(config.training.eval.eval_samples)

        def limited(it):
            for i, s in enumerate(it):
                if i >= max_samples:
                    return
                yield s

        chunks = limited(chunks)
    else:
        chunks = chunk_shuffle_buffer(chunks, 64, rng)  # wds.shuffle(64)

    packer = Packer(
        seq_len=int(cs.eval_seq_len if eval else cs.train_seq_len),
        token_range=cs.token_range,
        patch_size=patch_size,
        min_grid=cs.min_grid,
        dtype=wire_dtype(config),
        rng=rng,
        flush_final=eval,
    )
    yield from packer(chunks)
