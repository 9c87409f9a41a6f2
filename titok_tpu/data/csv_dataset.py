"""CSV-listed local video dataset (reference ``dataset/video_dataset_csv.py``).

Pipeline: infinite random file sampler over the CSV's ``path`` column
(``video_dataset_csv.py:54-57``) → chunk sampler → reservoir shuffle
buffer of 64 (train only, ``:122-131``) → dynamic packer. The reference
runs this in torch DataLoader worker processes; here decode happens in the
prefetcher's background threads (the libav calls release the GIL), keeping
one process and zero IPC serialization.
"""

from __future__ import annotations

import csv
from typing import Iterator

import numpy as np

from titok_tpu.data.chunking import chunk_shuffle_buffer, iter_video_chunks
from titok_tpu.data.packing import PackedBatch, Packer, wire_dtype
from titok_tpu.data.video_reader import VideoReader


def read_csv_paths(path: str) -> list[str]:
    with open(path, newline="") as f:
        return [row["path"] for row in csv.DictReader(f)]


def _chunk_stream(paths, sampling, patch_size, rng, eval):
    while True:
        fpath = paths[int(rng.integers(len(paths)))]
        try:
            reader = VideoReader(fpath)
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
        except Exception as error:  # decode failures skip (ref :117-118)
            print(f"Decode fail: {error}")


def csv_batches(config, eval: bool = False, seed: int = 0,
                buffer_size: int = 64) -> Iterator[PackedBatch]:
    """Yield PackedBatches forever (train) or until ``eval_samples`` (eval)."""
    cs = config.training.sampling
    patch_size = list(config.tokenizer.model.patch_size)
    rng = np.random.default_rng(seed)

    ds_path = (config.dataset.eval_dataset if eval
               else config.dataset.train_dataset)
    paths = read_csv_paths(ds_path)

    workers = int(config.dataset.get("workers", 0) or 0)
    if workers >= 1:
        # N parallel decode threads, deterministic round-robin merge
        # (reference num_workers, dataset/video_dataset.py:210-214)
        from titok_tpu.data.workers import WorkerPool, worker_seeds

        seeds = worker_seeds(seed, workers)

        def factory(w):
            return lambda: _chunk_stream(
                paths, cs, patch_size, np.random.default_rng(seeds[w]), eval
            )

        chunks = iter(WorkerPool([factory(w) for w in range(workers)]))
    else:
        chunks = _chunk_stream(paths, cs, patch_size, rng, eval)
    if eval:
        max_samples = int(config.training.eval.eval_samples)

        def limited(it):
            for i, s in enumerate(it):
                if i >= max_samples:
                    return
                yield s

        chunks = limited(chunks)
    else:
        chunks = chunk_shuffle_buffer(chunks, buffer_size, rng)

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
