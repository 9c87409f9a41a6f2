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
import numpy as np


class PrefetchLoader:
    def __init__(
        self,
        batch_iter_factory: Callable[[], Iterator],
        *,
        build_extras: Optional[Callable] = None,
        depth: int = 2,
        sharding=None,
        group: int = 1,
    ):
        self.factory = batch_iter_factory
        self.build_extras = build_extras
        self.depth = depth
        self.sharding = sharding
        # group > 1: stack that many consecutive batches host-side on a new
        # leading axis and ship them in ONE device_put — the input format of
        # the steps_per_call scan step (train_step.py:make_train_step_scan).
        # Yields (stacked_dev_arrays, list[PackedBatch], stacked_dev_extras);
        # a final partial group (end of a finite stream) is yielded with its
        # shorter actual length.
        self.group = int(group)
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _put(self, arrs: dict):
        if callable(self.sharding):  # per-tree placement (e.g. CP sharding)
            return self.sharding(arrs)
        if self.sharding is not None:
            return jax.device_put(arrs, self.sharding)
        return jax.device_put(arrs)

    @staticmethod
    def _host_arrays(extras: dict) -> dict:
        return {
            k: v.device_arrays() if hasattr(v, "device_arrays") else v
            for k, v in extras.items()
        }

    def _emit_group(self, pending: list):
        """Stack a list of (host_arrays, PackedBatch, host_extras) along a
        new leading axis and enqueue one device transfer."""
        arrs = [p[0] for p in pending]
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *arrs)
        extras_list = [p[2] for p in pending]
        stacked_extras = {
            k: jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *[e[k] for e in extras_list]
            )
            for k in extras_list[0]
        }
        self._queue.put((
            self._put(stacked),
            [p[1] for p in pending],
            {k: self._put(v) for k, v in stacked_extras.items()},
        ))

    def _worker(self):
        try:
            pending = []
            for batch in self.factory():
                if self._stop.is_set():
                    return
                extras = self.build_extras(batch) if self.build_extras else {}
                if self.group > 1:
                    pending.append(
                        (batch.device_arrays(), batch, self._host_arrays(extras))
                    )
                    if len(pending) == self.group:
                        self._emit_group(pending)
                        pending = []
                    continue
                dev = self._put(batch.device_arrays())
                dev_extras = {
                    k: self._put(v) for k, v in self._host_arrays(extras).items()
                }
                self._queue.put((dev, batch, dev_extras))
            if pending:  # finite stream: flush the last partial group
                self._emit_group(pending)
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
