"""HTTP serving host for exported tokenizer artifacts.

The reference has no serving layer at all (SURVEY.md §1); this closes
the loop on the AOT story: ``tools/export_model.py`` bakes the model
into StableHLO programs, and this host serves them with **no model
code, no flax, no checkpoint** — just jax (to execute the artifact) and
the numpy packer (to build the fixed-shape batch the program was
exported for, ``meta.json`` carries the baked shape parameters).

Protocol: npz bodies over HTTP (videos are float32 CTHW in [-1, 1],
the reference's wire format, reference ``dataset/video_dataset.py``):

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

One clip per request; concurrent requests are serialized onto the
device with a lock (the artifact is a single fixed-shape program — for
throughput, pack many clips per budget and call the artifact directly).
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
    pack_samples,
    sample_offsets,
    unpack_indices,
    unpack_videos,
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

    def _pack(self, video: np.ndarray, tokens: int):
        m = self.meta
        ps = list(m["patch_size"])
        dims = video.shape[1:]
        if any(d % p for d, p in zip(dims, ps)):
            raise ValueError(f"grid {dims} not divisible by patch {ps}")
        cost = math.prod(d // p for d, p in zip(dims, ps)) + int(tokens)
        if cost > m["seq_len"]:
            raise ValueError(
                f"clip needs {cost} slots > exported budget {m['seq_len']}"
            )
        return pack_samples(
            [np.asarray(video, np.float32)], [int(tokens)],
            seq_len=m["seq_len"], max_samples=m["max_samples"],
            patch_size=ps, head_dim=m["head_dim"],
        )

    def encode_clip(self, video: np.ndarray, tokens: int) -> np.ndarray:
        batch = self._pack(video, tokens)
        with self._lock:
            _, idx = self.forward(batch.device_arrays())
        return unpack_indices(np.asarray(idx), batch)[0]

    def forward_clip(self, video: np.ndarray, tokens: int):
        batch = self._pack(video, tokens)
        with self._lock:
            recon, idx = self.forward(batch.device_arrays())
        ps = list(self.meta["patch_size"])
        return (
            unpack_videos(np.asarray(recon, np.float32), batch, ps)[0],
            unpack_indices(np.asarray(idx), batch)[0],
        )

    def decode_clip(self, indices: np.ndarray, grid) -> np.ndarray:
        m = self.meta
        dummy = np.zeros([m["in_channels"]] + [int(g) for g in grid],
                         np.float32)
        batch = self._pack(dummy, len(indices))
        offs = sample_offsets(batch.token_counts, batch.grid_sizes)
        flat = np.zeros((batch.seq_len,), np.int32)
        flat[offs[0] : offs[0] + len(indices)] = np.asarray(indices, np.int32)
        with self._lock:
            recon = self.decode(flat, batch.device_arrays())
        ps = list(m["patch_size"])
        return unpack_videos(np.asarray(recon, np.float32), batch, ps)[0]


def _npz(body: bytes) -> dict:
    return dict(np.load(io.BytesIO(body)))


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def make_server(artifacts_dir: str, port: int = 0):
    """Build (but don't start) the HTTP server; returns it with
    ``.service`` attached. ``port=0`` picks a free port
    (``server.server_address[1]``)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

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
                    grid = np.asarray(req["video"].shape[1:], np.int32)
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
            except Exception as e:  # client error surface
                self._reply(400, str(e).encode(), "text/plain")

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    server.service = service
    return server


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--artifacts", required=True,
                    help="directory written by tools/export_model.py")
    ap.add_argument("--port", type=int, default=8600)
    args = ap.parse_args()
    server = make_server(args.artifacts, args.port)
    meta = server.service.meta
    print(f"serving {args.artifacts} (budget {meta['seq_len']}, "
          f"quant {meta.get('quant')}) on "
          f"http://127.0.0.1:{server.server_address[1]}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
