"""Parallel host decode workers with deterministic fan-in.

The reference hides decode latency behind 3 torch DataLoader worker
*processes* (``dataset/video_dataset.py:210-214``, ``num_workers=3``,
persistent workers). Here the workers are threads: the hot host-side ops
(libav decode in ``native/video_decoder.cpp``, PIL resizes, the fused C++
patchify) all release the GIL, so threads give real parallelism on a
multi-core TPU VM host without any IPC serialization of frame buffers.

Determinism: torch's DataLoader is reproducible because each worker owns
an index slice and the loader collects results in index order. The same
idea here — each worker owns an independent sample stream (its own rng,
its own shard/file slice) and the consumer merges **round-robin**, one
item per worker per turn. The merged stream is therefore a pure function
of the seed, independent of thread scheduling; a regression test asserts
byte-identical batches across runs (``tests/test_data_pipeline.py``).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

_SENTINEL = object()


class WorkerPool:
    """Run N item streams in background threads, merge round-robin.

    ``factories[w]()`` must return the w-th worker's iterator. Each worker
    fills a bounded queue (``depth`` items) so fast workers stay ahead of
    the consumer; the consumer takes exactly one item from each live
    worker in turn, preserving a scheduling-independent order. A worker
    whose stream ends leaves the rotation; iteration ends when all do.
    Exceptions raised inside a worker propagate to the consumer.
    """

    def __init__(self, factories: list[Callable[[], Iterator]], depth: int = 8):
        assert factories, "WorkerPool needs at least one worker"
        self.factories = factories
        self.depth = depth
        self._queues: list[queue.Queue] = []
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()

    def _run(self, factory: Callable[[], Iterator], q: queue.Queue):
        try:
            for item in factory():
                if self._stop.is_set():
                    return
                q.put(item)
            q.put(_SENTINEL)
        except Exception as e:  # propagate to consumer
            q.put(e)

    def __iter__(self) -> Iterator:
        self._queues = [queue.Queue(maxsize=self.depth) for _ in self.factories]
        self._threads = []
        for factory, q in zip(self.factories, self._queues):
            t = threading.Thread(target=self._run, args=(factory, q), daemon=True)
            t.start()
            self._threads.append(t)

        live = list(self._queues)
        try:
            while live:
                nxt = []
                for q in live:
                    item = q.get()
                    if item is _SENTINEL:
                        continue
                    if isinstance(item, Exception):
                        raise item
                    yield item
                    nxt.append(q)
                live = nxt
        finally:
            self.stop()

    def stop(self):
        self._stop.set()
        # drain so blocked producers can observe the stop flag
        for q in self._queues:
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def worker_seeds(seed: int, n: int) -> list[int]:
    """Independent per-worker seeds (stable across runs for a fixed seed),
    mirroring the reference's per-worker reseeding
    (``dataset/video_dataset_csv.py:192-194``)."""
    import numpy as np

    ss = np.random.SeedSequence(seed)
    return [int(s.generate_state(1)[0]) for s in ss.spawn(n)]
