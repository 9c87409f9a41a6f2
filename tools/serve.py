"""HTTP serving host for exported tokenizer artifacts.

The reference has no serving layer at all (SURVEY.md §1); this closes
the loop on the AOT story: ``tools/export_model.py`` bakes the model
into StableHLO programs, and this host serves them with **no model
code, no flax, no checkpoint** — just jax (to execute the artifact) and
the numpy packer (to build the fixed-shape batch the program was
exported for, ``meta.json`` carries the baked shape parameters).

Protocol: npz bodies over HTTP. Videos are float32 CTHW in [-1, 1]
(the reference's wire format, reference ``dataset/video_dataset.py``)
or uint8 THWC (half the wire bytes; normalized by the packer):

    POST /encode   npz{video, tokens}          -> npz{indices, grid}
    POST /decode   npz{indices, grid}          -> npz{video}
    POST /forward  npz{video, tokens}          -> npz{video, indices}
    GET  /healthz                              -> meta.json

Usage::

    python tools/serve.py --artifacts exported/ --port 8600

    # client
    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.savez(buf, video=vid, tokens=16)
    r = urllib.request.urlopen("http://localhost:8600/encode",
                               buf.getvalue())
    out = np.load(io.BytesIO(r.read()))
    out["indices"], out["grid"]

By default each request runs its own device call (serialized with a
lock). With ``--batch-window-ms > 0``, concurrent requests arriving
within the window are packed into ONE budget-sized device call — the
variable-shape sequence packing the trainer uses doubles as the serving
batcher, so throughput scales with clips-per-budget.
"""

from __future__ import annotations

import argparse
import io
import json
import math
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _honor_platform_env():
    """The axon sitecustomize forces jax_platforms=axon even over an
    explicit JAX_PLATFORMS env var; restore the user's choice (the
    artifact records which platforms it was lowered for)."""
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


_honor_platform_env()

from titok_tpu.data.packing import (
    GridOnly,
    pack_samples,
    sample_offsets,
    unpack_indices,
    unpack_videos,
    video_dims,
)


class TokenizerService:
    """Wraps the exported programs with pack/unpack for one clip."""

    def __init__(self, artifacts_dir: str):
        from tools.export_model import load_exported

        self.forward, self.decode, self.meta = load_exported(artifacts_dir)
        if "max_samples" not in self.meta:
            raise ValueError(
                "artifact meta.json lacks max_samples — re-export with the "
                "current tools/export_model.py"
            )
        self._lock = threading.Lock()
        self.device_calls = 0  # forwards + decodes actually dispatched

    def _cost(self, video: np.ndarray, tokens: int) -> int:
        """Budget slots this clip needs; raises on an unservable clip.
        Accepts float CTHW in [-1, 1] or uint8 THWC (half the wire bytes;
        the packer normalizes)."""
        m = self.meta
        ps = list(m["patch_size"])
        dims = video_dims(video)
        if any(d % p for d, p in zip(dims, ps)):
            raise ValueError(f"grid {dims} not divisible by patch {ps}")
        cost = math.prod(d // p for d, p in zip(dims, ps)) + int(tokens)
        if cost > m["seq_len"]:
            raise ValueError(
                f"clip needs {cost} slots > exported budget {m['seq_len']}"
            )
        return cost

    def _pack_group(self, videos, tokens):
        m = self.meta
        return pack_samples(
            [v if (isinstance(v, GridOnly) or v.dtype == np.uint8)
             else np.asarray(v, np.float32) for v in videos],
            [int(t) for t in tokens],
            seq_len=m["seq_len"], max_samples=m["max_samples"],
            patch_size=list(m["patch_size"]), head_dim=m["head_dim"],
        )

    # -- grouped execution (one device call for N clips) -------------------
    def forward_group(self, videos, tokens):
        """[(recon, indices)] for up to a budget's worth of clips."""
        for v, t in zip(videos, tokens):
            self._cost(v, t)
        batch = self._pack_group(videos, tokens)
        with self._lock:
            self.device_calls += 1
            recon, idx = self.forward(batch.device_arrays())
        ps = list(self.meta["patch_size"])
        vids = unpack_videos(np.asarray(recon, np.float32), batch, ps)
        idxs = unpack_indices(np.asarray(idx), batch)
        return list(zip(vids[: len(videos)], idxs[: len(videos)]))

    def decode_group(self, indices_list, grids):
        """[video] for up to a budget's worth of (indices, grid) pairs."""
        m = self.meta
        dummies = [GridOnly(grid, m["in_channels"]) for grid in grids]
        for d, ix in zip(dummies, indices_list):
            self._cost(d, len(ix))
        batch = self._pack_group(dummies, [len(ix) for ix in indices_list])
        offs = sample_offsets(batch.token_counts, batch.grid_sizes)
        flat = np.zeros((batch.seq_len,), np.int32)
        for j, ix in enumerate(indices_list):
            flat[offs[j] : offs[j] + len(ix)] = np.asarray(ix, np.int32)
        with self._lock:
            self.device_calls += 1
            recon = self.decode(flat, batch.device_arrays())
        ps = list(m["patch_size"])
        return unpack_videos(np.asarray(recon, np.float32), batch,
                             ps)[: len(grids)]

    # -- single-clip API ----------------------------------------------------
    def encode_clip(self, video: np.ndarray, tokens: int) -> np.ndarray:
        return self.forward_group([video], [tokens])[0][1]

    def forward_clip(self, video: np.ndarray, tokens: int):
        return self.forward_group([video], [tokens])[0]

    def decode_clip(self, indices: np.ndarray, grid) -> np.ndarray:
        return self.decode_group([indices], [grid])[0]


class BatchingTokenizerService(TokenizerService):
    """Cross-request batching: requests arriving within ``window_ms`` of
    each other are packed into ONE budget-sized device call (the packed
    layout exists exactly for this — N variable-shape clips, one program).
    Throughput scales with clips-per-budget; per-request latency pays at
    most the window plus the shared forward."""

    def __init__(self, artifacts_dir: str, window_ms: float = 0.0):
        super().__init__(artifacts_dir)
        import queue

        self.window_s = float(window_ms) / 1000.0
        self._queue: "queue.Queue" = queue.Queue()
        self._holdover = None  # item that didn't fit the last group
        t = threading.Thread(target=self._dispatch_loop, daemon=True)
        t.start()

    # public API: validate in the request thread, then enqueue and wait
    def _submit(self, op: str, payload, cost: int):
        done = threading.Event()
        slot: dict = {}
        self._queue.put((op, payload, cost, done, slot))
        done.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def encode_clip(self, video, tokens):
        cost = self._cost(video, tokens)
        return self._submit("fwd", (video, tokens), cost)[1]

    def forward_clip(self, video, tokens):
        cost = self._cost(video, tokens)
        return self._submit("fwd", (video, tokens), cost)

    def decode_clip(self, indices, grid):
        dummy = GridOnly(grid, self.meta["in_channels"])
        cost = self._cost(dummy, len(indices))
        return self._submit("dec", (indices, grid), cost)

    def _gather_group(self):
        """Block for one item, then collect same-op items arriving within
        the window while the group fits the budget."""
        import queue
        import time as _time

        first = self._holdover or self._queue.get()
        self._holdover = None
        op = first[0]
        group = [first]
        used = first[2]
        deadline = _time.monotonic() + self.window_s
        while (len(group) < self.meta["max_samples"]):
            remaining = deadline - _time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item[0] != op or used + item[2] > self.meta["seq_len"]:
                self._holdover = item  # starts the next group
                break
            group.append(item)
            used += item[2]
        return op, group

    def _dispatch_loop(self):
        while True:
            op, group = self._gather_group()
            try:
                if op == "fwd":
                    outs = self.forward_group(
                        [g[1][0] for g in group], [g[1][1] for g in group]
                    )
                else:
                    outs = self.decode_group(
                        [g[1][0] for g in group], [g[1][1] for g in group]
                    )
                for (_, _, _, done, slot), out in zip(group, outs):
                    slot["out"] = out
                    done.set()
            except Exception as e:
                for _, _, _, done, slot in group:
                    slot["err"] = e
                    done.set()


def _npz(body: bytes) -> dict:
    return dict(np.load(io.BytesIO(body)))


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def make_server(artifacts_dir: str, port: int = 0, window_ms: float = 0.0):
    """Build (but don't start) the HTTP server; returns it with
    ``.service`` attached. ``port=0`` picks a free port
    (``server.server_address[1]``). ``window_ms > 0`` batches concurrent
    requests into shared device calls (one request thread each under
    ``ThreadingHTTPServer``; they block on the shared dispatch)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    if window_ms > 0:
        service = BatchingTokenizerService(artifacts_dir, window_ms)
    else:
        service = TokenizerService(artifacts_dir)

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, body: bytes,
                   ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, json.dumps(service.meta).encode(),
                            "application/json")
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = _npz(self.rfile.read(n))
                if self.path == "/encode":
                    idx = service.encode_clip(req["video"],
                                              int(req["tokens"]))
                    grid = np.asarray(video_dims(req["video"]), np.int32)
                    out = _npz_bytes(indices=idx, grid=grid)
                elif self.path == "/decode":
                    vid = service.decode_clip(req["indices"], req["grid"])
                    out = _npz_bytes(video=vid)
                elif self.path == "/forward":
                    vid, idx = service.forward_clip(req["video"],
                                                    int(req["tokens"]))
                    out = _npz_bytes(video=vid, indices=idx)
                else:
                    self._reply(404, b"not found", "text/plain")
                    return
                self._reply(200, out)
            except (ValueError, KeyError) as e:  # malformed request
                self._reply(400, str(e).encode(), "text/plain")
            except Exception as e:  # device/internal failure — retryable
                self._reply(500, str(e).encode(), "text/plain")

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    server.service = service
    return server


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--artifacts", required=True,
                    help="directory written by tools/export_model.py")
    ap.add_argument("--port", type=int, default=8600)
    ap.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="batch concurrent requests arriving within this "
                         "window into one packed device call (0 = off)")
    args = ap.parse_args()
    server = make_server(args.artifacts, args.port, args.batch_window_ms)
    meta = server.service.meta
    print(f"serving {args.artifacts} (budget {meta['seq_len']}, "
          f"quant {meta.get('quant')}) on "
          f"http://127.0.0.1:{server.server_address[1]}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
