"""Host→device prefetching: background packing + double-buffered transfer.

The reference hides decode latency behind 3 torch DataLoader worker
processes (``video_dataset.py:210-211``). TPU-natively, the goal is the
same — the device must never wait on the host — but the mechanism is a
background thread (libav decode and numpy packing release the GIL) that
runs the full pipeline and **eagerly jax.device_put()s** batches, so the
H2D DMA for batch N+1 overlaps the device step on batch N.

Emits (device_arrays, PackedBatch, extras) where extras holds the
host-built disc/perceptual plans when requested.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class PrefetchLoader:
    def __init__(
        self,
        batch_iter_factory: Callable[[], Iterator],
        *,
        build_extras: Optional[Callable] = None,
        depth: int = 2,
        sharding=None,
    ):
        self.factory = batch_iter_factory
        self.build_extras = build_extras
        self.depth = depth
        self.sharding = sharding
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _put(self, arrs: dict):
        if callable(self.sharding):  # per-tree placement (e.g. CP sharding)
            return self.sharding(arrs)
        if self.sharding is not None:
            return jax.device_put(arrs, self.sharding)
        return jax.device_put(arrs)

    def _worker(self):
        try:
            for batch in self.factory():
                if self._stop.is_set():
                    return
                extras = self.build_extras(batch) if self.build_extras else {}
                dev = self._put(batch.device_arrays())
                dev_extras = {
                    k: self._put(v.device_arrays()) if hasattr(v, "device_arrays")
                    else self._put(v)
                    for k, v in extras.items()
                }
                self._queue.put((dev, batch, dev_extras))
            self._queue.put(None)  # end of stream
        except Exception as e:  # surface errors to the consumer
            self._queue.put(e)

    def __iter__(self):
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        while True:
            item = self._queue.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def stop(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
