"""Benchmark: encode+decode throughput of the tiny tokenizer on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

The reference publishes no numbers (see BASELINE.md), so the baseline is
this repo's own first recorded run (BENCH_BASELINE.json, committed after
the first TPU measurement); vs_baseline > 1.0 means faster than that.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def build_bench(seq_len=6144, clip=(8, 128, 128), token_count=64, iters=20):
    """tiny.yaml-shaped workload: 128² 8-frame clips, ~64 latent tokens.

    The timed function runs ``iters`` forwards inside one jitted
    ``lax.scan`` with a serial data dependency, returning a single scalar.
    Timing = wall time of (dispatch + K executions + scalar fetch): on the
    tunneled axon backend ``block_until_ready`` returns before execution
    completes, so per-call host timing lies; the on-device chain amortizes
    the RTT to nothing and forces real completion via the scalar fetch.
    """
    import jax
    import jax.numpy as jnp

    from titok_tpu.data.packing import pack_samples
    from titok_tpu.models.titok import TiTok

    patch = (4, 8, 8)
    rng = np.random.default_rng(0)
    grid = (clip[0] // patch[0]) * (clip[1] // patch[1]) * (clip[2] // patch[2])
    per = grid + token_count
    model = TiTok(patch_size=patch, dtype=jnp.bfloat16, attn_impl="auto",
                  max_seg_len=per)
    n = seq_len // per
    vids = [rng.uniform(-1, 1, size=(3, *clip)).astype(np.float32)
            for _ in range(n)]
    batch = pack_samples(vids, [token_count] * n, seq_len=seq_len,
                         max_samples=max(n, 1), patch_size=patch)
    arrs = jax.device_put(batch.device_arrays())
    params = model.init(jax.random.PRNGKey(0), arrs)["params"]

    @jax.jit
    def chained(params, arrs):
        def body(carry, _):
            # tiny carry-dependent perturbation keeps iterations serial
            # without changing the math measurably
            a = dict(arrs)
            a["patches"] = arrs["patches"] + (carry * 1e-30).astype(
                arrs["patches"].dtype
            )
            recon, aux = model.apply({"params": params}, a)
            return recon.astype(jnp.float32).sum(), aux["indices"][0]

        final, idx = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return final, idx[-1]

    return chained, params, arrs, n


LAST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LAST.json")
WATCHDOG_S = int(os.environ.get("TITOK_BENCH_TIMEOUT", "480"))


def _watchdog():
    """The axon TPU relay sometimes wedges (all device calls hang). If the
    measurement doesn't finish in time, emit the last recorded measurement
    with an explicit staleness note instead of hanging the driver."""
    import threading

    def fire():
        fallback = {"metric": "clips/sec/chip encode+decode (tiny cfg, "
                              "8x128^2 clips, seq 6144)",
                    "value": 0.0, "unit": "clips/sec/chip", "vs_baseline": 0.0,
                    "note": "TPU relay unreachable; no measurement"}
        if os.path.exists(LAST_PATH):
            fallback = json.load(open(LAST_PATH))
            fallback["note"] = ("TPU relay unreachable during this run; "
                                "value is the last recorded measurement")
        print(json.dumps(fallback), flush=True)
        os._exit(0)

    t = threading.Timer(WATCHDOG_S, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax

    timer = _watchdog()
    iters = 20
    fn, params, arrs, clips_per_batch = build_bench(iters=iters)

    # warmup: compile + one full chained run, fetched
    _ = np.asarray(fn(params, arrs)[0])

    t0 = time.perf_counter()
    out = fn(params, arrs)
    _ = np.asarray(out[0])  # forces completion across the tunnel
    dt = time.perf_counter() - t0

    clips_per_sec = clips_per_batch * iters / dt

    vs = 1.0
    if os.path.exists(BASELINE_PATH):
        base = json.load(open(BASELINE_PATH))
        if base.get("value"):
            vs = clips_per_sec / float(base["value"])
    else:
        json.dump(
            {"value": clips_per_sec, "backend": jax.default_backend(),
             "note": "first recorded run; later runs report vs this"},
            open(BASELINE_PATH, "w"),
        )

    timer.cancel()
    result = {
        "metric": "clips/sec/chip encode+decode (tiny cfg, 8x128^2 clips, "
                  "seq 6144)",
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs, 4),
    }
    json.dump(result, open(LAST_PATH, "w"))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
