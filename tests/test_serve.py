"""HTTP serving host (tools/serve.py) over exported artifacts — the
serving loop the reference doesn't have (SURVEY.md §1 "no serving
layer"): export → host → npz-over-HTTP client round trip."""

import io
import threading
import urllib.request

import numpy as np
import pytest

from tests.util import tiny_config
from titok_tpu.models.titok import TiTokModel, make_titok


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from tools.export_model import export_model
    from tools.serve import make_server

    cfg = tiny_config()
    model = TiTokModel(make_titok(cfg), seq_len=256, min_grid=(4, 16, 16))
    art = str(tmp_path_factory.mktemp("artifacts"))
    export_model(model.module, model.params, model.vq_state,
                 model._dummy_batch(), art)
    server = make_server(art, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield model, base
    server.shutdown()


def _post(url: str, **arrays) -> dict:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    with urllib.request.urlopen(url, buf.getvalue(), timeout=300) as r:
        return dict(np.load(io.BytesIO(r.read())))


def test_healthz(served):
    _, base = served
    import json

    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        meta = json.loads(r.read())
    assert meta["seq_len"] == 256 and "max_samples" in meta


def test_encode_decode_matches_model(served):
    model, base = served
    rng = np.random.default_rng(0)
    vid = (rng.random((3, 4, 16, 16), np.float32) * 2 - 1)

    out = _post(base + "/encode", video=vid, tokens=5)
    ref_idx = model.encode([vid], [5])[0]
    np.testing.assert_array_equal(out["indices"], ref_idx)
    np.testing.assert_array_equal(out["grid"], vid.shape[1:])

    dec = _post(base + "/decode", indices=out["indices"], grid=out["grid"])
    ref_vid = model.decode_indices([ref_idx], [vid.shape[1:]])[0]
    assert dec["video"].shape == ref_vid.shape
    np.testing.assert_allclose(dec["video"], np.asarray(ref_vid, np.float32),
                               rtol=1e-4, atol=1e-4)

    fwd = _post(base + "/forward", video=vid, tokens=5)
    np.testing.assert_array_equal(fwd["indices"], ref_idx)
    assert fwd["video"].shape == ref_vid.shape

    # uint8 THWC wire (half the bytes): same indices as the float clip
    u8 = np.clip(np.rint((vid + 1) * 127.5), 0, 255).astype(
        np.uint8).transpose(1, 2, 3, 0)
    out8 = _post(base + "/encode", video=u8, tokens=5)
    ref8 = model.encode([u8], [5])[0]
    np.testing.assert_array_equal(out8["indices"], ref8)
    np.testing.assert_array_equal(out8["grid"], vid.shape[1:])


def test_batched_serving_matches_single(served, tmp_path_factory):
    """window_ms > 0: concurrent requests pack into shared device calls —
    same results as single-clip serving, strictly fewer device calls."""
    from concurrent.futures import ThreadPoolExecutor

    from tools.export_model import export_model
    from tools.serve import make_server

    model, _ = served
    art = str(tmp_path_factory.mktemp("art_batch"))
    export_model(model.module, model.params, model.vq_state,
                 model._dummy_batch(), art)
    server = make_server(art, port=0, window_ms=400)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        rng = np.random.default_rng(2)
        vids = [(rng.random((3, 4, 16, 16), np.float32) * 2 - 1)
                for _ in range(4)]
        # warm the program so batched requests land inside one window
        _post(base + "/encode", video=vids[0], tokens=4)
        calls_before = server.service.device_calls

        with ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(
                lambda v: _post(base + "/encode", video=v, tokens=4), vids
            ))
        calls = server.service.device_calls - calls_before
        assert calls < 4, f"no batching happened ({calls} calls for 4 reqs)"
        ref = model.encode(vids, [4] * 4)
        for out, r in zip(outs, ref):
            np.testing.assert_array_equal(out["indices"], r)
    finally:
        server.shutdown()


def test_serve_bench_tool(served, tmp_path_factory):
    """tools/serve_bench.py: load-bench runs against a fresh in-process
    server, completes every request, and reports a batching factor."""
    from tools.export_model import export_model
    from tools.serve_bench import run_bench

    model, _ = served
    art = str(tmp_path_factory.mktemp("art_bench"))
    export_model(model.module, model.params, model.vq_state,
                 model._dummy_batch(), art)
    res = run_bench(art, op="forward", clients=4, requests=8,
                    thw=(4, 16, 16), tokens=4, window_ms=300, uint8=True)
    assert res["ok"] == 8 and not res["errors"]
    assert res["clips_per_sec"] > 0 and res["device_calls"] >= 1
    assert res["clips_per_call"] >= 1.0
    assert res["p95_ms"] >= res["p50_ms"] > 0


def test_client_errors_are_400(served):
    _, base = served
    rng = np.random.default_rng(1)
    # grid not divisible by patch
    bad = rng.random((3, 5, 17, 16), np.float32)
    buf = io.BytesIO()
    np.savez(buf, video=bad, tokens=4)
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/encode", buf.getvalue(), timeout=60)
    assert ei.value.code == 400
    # over-budget clip
    big = rng.random((3, 64, 64, 64), np.float32)
    buf = io.BytesIO()
    np.savez(buf, video=big, tokens=4)
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/encode", buf.getvalue(), timeout=60)
    assert ei.value.code == 400
