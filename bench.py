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


def build_bench(seq_len=6144, clip=(8, 128, 128), token_count=64, iters=20,
                quant=None):
    """tiny.yaml-shaped workload: 128² 8-frame clips, ~64 latent tokens.

    The timed function runs ``iters`` forwards inside one jitted
    ``lax.scan`` with a serial data dependency, returning a single scalar.
    Timing = wall time of (dispatch + K executions + scalar fetch): on the
    tunneled axon backend ``block_until_ready`` returns before execution
    completes, so per-call host timing lies; the on-device chain amortizes
    the RTT to nothing and forces real completion via the scalar fetch.

    ``quant`` (``w8a16``/``w8a8``) runs the int8 serving path
    (``titok_tpu/serving/quant.py``) on the same workload.
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
    if quant:
        from titok_tpu.serving.quant import quantize_params, quantized_apply

        params = jax.device_put(quantize_params(params))

        def apply_fn(p, a):
            return quantized_apply(model, {"params": p}, a, mode=quant)
    else:
        def apply_fn(p, a):
            return model.apply({"params": p}, a)

    @jax.jit
    def chained(params, arrs):
        def body(carry, _):
            # tiny carry-dependent perturbation keeps iterations serial
            # without changing the math measurably
            a = dict(arrs)
            a["patches"] = arrs["patches"] + (carry * 1e-30).astype(
                arrs["patches"].dtype
            )
            recon, aux = apply_fn(params, a)
            return recon.astype(jnp.float32).sum(), aux["indices"][0]

        final, idx = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return final, idx[-1]

    return chained, params, arrs, n


LAST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LAST.json")
TRAIN_LAST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_TRAIN_LAST.json")
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


def _bench_config(seq_len, token_range, model_size="tiny", clip=(8, 128, 128),
                  remat=False):
    """tiny.yaml-shaped config for the train-step benchmarks."""
    from titok_tpu.config import Config

    return Config({
        "general": {"wandb": {}, "checkpoints": {}},
        "tokenizer": {
            "model": {"patch_size": [4, 8, 8], "fsq_levels": [7, 5, 5, 5, 5],
                      "encoder_size": model_size, "decoder_size": model_size},
            "losses": {"disc_weight": 0.0, "perceptual_weight": 0.0,
                       "gram_weight": 0.0, "perceptual_samples_per_step": 2,
                       "perceptual_sampling_size": 128},
        },
        "discriminator": {
            "model": {"patch_size": [4, 8, 8], "model_size": model_size},
            "losses": {"gp_weight": 0.1, "gp_noise": 0.1,
                       "centering_weight": 0.01},
        },
        "optimizer": {"learning_rate": 1e-4, "end_lr": 1e-5, "beta1": 0.9,
                      "beta2": 0.95, "warmup_steps": 10, "weight_decay": 1e-4,
                      "disc_lr_ratio": 1.0},
        "dataset": {"train_dataset": "synthetic", "eval_dataset": "synthetic"},
        "training": {
            "sampling": {"token_range": list(token_range),
                         "min_grid": list(clip), "max_grid": list(clip),
                         "fps_range": [3, 5], "max_aspect_ratio": 2,
                         "min_scale": 0.8, "train_seq_len": seq_len,
                         "eval_seq_len": seq_len},
            "main": {"max_steps": 1000, "precision": "bf16-mixed", "seed": 0,
                     "max_grad_norm": 1.0, "attn_impl": "auto",
                     "remat": remat},
            "eval": {"eval_step_interval": 0, "eval_samples": 0,
                     "log_codebook": False, "log_metrics": [],
                     "log_recon_num": 0, "random_recon": False},
        },
    })


def bench_train(seq_len=6144, clip=(8, 128, 128), token_count=64, iters=10,
                model_size="tiny", remat=False, variants=("L1", "L1+GAN"),
                tag="tiny cfg"):
    """Train-step throughput (VERDICT r1 weak #8): L1-only and L1+GAN
    clips/sec/chip, scan-chained like the forward bench. Each variant gets
    its own watchdog so a relay wedge mid-train-bench still emits the last
    recorded value; results go to stderr as one JSON line per variant,
    keeping the stdout single-line contract."""
    import sys

    import jax
    import jax.numpy as jnp

    from titok_tpu.data.packing import build_disc_batch, pack_samples
    from titok_tpu.losses.loss_module import LossSystem
    from titok_tpu.models.titok import make_titok
    from titok_tpu.training.train_step import TrainStepBuilder

    patch = (4, 8, 8)
    rng = np.random.default_rng(0)
    grid = (clip[0] // patch[0]) * (clip[1] // patch[1]) * (clip[2] // patch[2])
    per = grid + token_count
    n = seq_len // per
    vids = [rng.uniform(-1, 1, size=(3, *clip)).astype(np.float32)
            for _ in range(n)]
    batch = pack_samples(vids, [token_count] * n, seq_len=seq_len,
                         max_samples=max(n, 1), patch_size=patch)

    results = {}
    for name, disc_weight in (("L1", 0.0), ("L1+GAN", 0.4)):
        if name not in variants:
            continue
        cfg = _bench_config(seq_len, (token_count, token_count),
                            model_size=model_size, clip=clip, remat=remat)
        cfg.set_dotted("tokenizer.losses.disc_weight", disc_weight)
        model = make_titok(cfg)
        ls = LossSystem(cfg)
        builder = TrainStepBuilder(model, ls, cfg)
        disc = build_disc_batch(batch, ls.disc_tokens) if ls.use_disc else None
        arrs = jax.device_put(batch.device_arrays())
        disc_arrs = (jax.device_put(disc.device_arrays())
                     if disc is not None else None)
        state = builder.init_state(jax.random.PRNGKey(0), arrs, disc_arrs)
        step_fn = builder.make_train_step({})

        @jax.jit
        def chained(state, arrs, disc_arrs):
            def body(st, _):
                st, metrics, _ = step_fn(st, arrs, disc_arrs, None)
                return st, metrics["gen/total_loss"]

            st, losses = jax.lax.scan(body, state, None, length=iters)
            return losses[-1]

        # warmup (compile) + timed run, both force completion via fetch
        _ = np.asarray(chained(state, arrs, disc_arrs))
        t0 = time.perf_counter()
        _ = np.asarray(chained(state, arrs, disc_arrs))
        dt = time.perf_counter() - t0

        clips_per_sec = n * iters / dt
        line = {
            "metric": f"clips/sec/chip train-step {name} ({tag}, "
                      f"{clip[0]}x{clip[1]}^2 clips, seq {seq_len})",
            "value": round(clips_per_sec, 3),
            "unit": "clips/sec/chip",
            "step_ms": round(dt / iters * 1e3, 2),
        }
        results[name] = line
        print(json.dumps(line), file=sys.stderr, flush=True)
    return results


BASE_LAST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_BASE_LAST.json")


def bench_base_forward(seq_len=4096, clip=(16, 256, 256), token_count=64,
                       iters=6, model_size="base", quantizer="vq",
                       label="base_vq cfg, EMA-VQ 16k"):
    """Forward encode+decode at the base_vq.yaml north-star shapes
    (BASELINE.json configs[2]): base tokenizer (12L, width 768, 12q/4kv
    heads), patch [4,16,16], 16x256^2 clips, EMA-VQ 16k codebook via the
    Pallas nearest-neighbor kernel. Scan-chained like build_bench.
    model_size/quantizer parameterize the same harness for the large
    (24L/1024w, FSQ-16k) config."""
    import jax
    import jax.numpy as jnp

    from titok_tpu.data.packing import pack_samples
    from titok_tpu.models.titok import TiTok
    from titok_tpu.models.vq import init_vq_state

    patch = (4, 16, 16)
    rng = np.random.default_rng(0)
    grid = (clip[0] // patch[0]) * (clip[1] // patch[1]) * (clip[2] // patch[2])
    per = grid + token_count
    n = seq_len // per
    kw = {}
    if quantizer == "vq":
        kw = dict(vq_codebook_size=16384, vq_dim=8)
    else:
        kw = dict(fsq_levels=(8, 8, 8, 6, 5))  # 16k-code FSQ (large.yaml)
    model = TiTok(patch_size=patch, encoder_size=model_size,
                  decoder_size=model_size, dtype=jnp.bfloat16,
                  attn_impl="auto", quantizer=quantizer, max_seg_len=per,
                  **kw)
    vids = [rng.uniform(-1, 1, size=(3, *clip)).astype(np.float32)
            for _ in range(n)]
    batch = pack_samples(vids, [token_count] * n, seq_len=seq_len,
                         max_samples=max(n, 1), patch_size=patch)
    arrs = jax.device_put(batch.device_arrays())
    vq_state = (init_vq_state(jax.random.PRNGKey(1), 16384, 8)
                if quantizer == "vq" else None)
    params = model.init(jax.random.PRNGKey(0), arrs, vq_state)["params"]

    @jax.jit
    def chained(params, arrs, vq_state):
        def body(carry, _):
            a = dict(arrs)
            a["patches"] = arrs["patches"] + (carry * 1e-30).astype(
                arrs["patches"].dtype
            )
            recon, aux = model.apply({"params": params}, a, vq_state)
            return recon.astype(jnp.float32).sum(), aux["indices"][0]

        final, idx = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return final, idx[-1]

    _ = np.asarray(chained(params, arrs, vq_state)[0])  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(chained(params, arrs, vq_state)[0])
    dt = time.perf_counter() - t0
    return {
        "metric": f"clips/sec/chip encode+decode ({label}, "
                  f"{clip[0]}x{clip[1]}^2 clips, seq {seq_len})",
        "value": round(n * iters / dt, 3),
        "unit": "clips/sec/chip",
        "fwd_ms": round(dt / iters * 1e3, 2),
    }


def bench_base(out=None):
    """Base-scale bench suite (VERDICT r2 missing #1): converts the
    untested base-shape surfaces (flash kernel at S=12288, remat, 16k VQ
    Pallas lookup, scatter-add EMA) into measured numbers. Gated behind
    TITOK_BENCH_BASE=1: the base GAN step is a compile-heavy remote
    program and heavy compiles can wedge the relay for 30-60 min
    (CLAUDE.md), so the driver's default bench run stays tiny-only."""
    import sys

    results = {}
    results["base_forward"] = bench_base_forward()
    print(json.dumps(results["base_forward"]), file=sys.stderr, flush=True)
    json.dump(results, open(BASE_LAST_PATH, "w"))
    # base at the base_3axis per-ring budget (12288), remat on: 16x160^2
    # clips, 1664 slots each -> 7 clips/step
    for variant in ("L1", "L1+GAN"):
        try:
            r = bench_train(seq_len=12288, clip=(16, 160, 160), iters=3,
                            model_size="base", remat=True, variants=(variant,),
                            tag="base cfg remat")
            results.update({f"base_{k}": v for k, v in r.items()})
        except Exception as e:  # e.g. HBM OOM: record, keep the suite going
            msg = str(e).splitlines()[:3]
            results[f"base_{variant}"] = {
                "metric": f"train-step {variant} (base cfg remat)",
                "value": 0.0, "error": " ".join(msg)[:500],
            }
            print(json.dumps(results[f"base_{variant}"]), file=sys.stderr,
                  flush=True)
        json.dump(results, open(BASE_LAST_PATH, "w"))
    return results


SPC_LAST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_SPC_LAST.json")


def bench_steps_per_call(seq_len=12288, clip=(16, 160, 160), token_count=64,
                         total_steps=16, ks=(1, 8), model_size="base",
                         remat=True, tag="base cfg remat", results=None):
    """K-steps-per-dispatch amortization at base scale (round-3 verdict
    "do this" #8): ``training.main.steps_per_call`` exists to amortize
    the per-dispatch relay RTT, but no on-chip K>1 number was committed.
    Measures the SAME ``lax.scan``-of-K program the trainer builds:
    wall-time for ``total_steps`` real L1+GAN train steps issued as
    ``total_steps/K`` dispatches (state threaded through the carry,
    completion forced by fetching the final loss). Gated behind
    TITOK_BENCH_SPC=1 — the K=8 base program is a heavy remote compile."""
    import sys

    import jax

    from titok_tpu.data.packing import build_disc_batch, pack_samples
    from titok_tpu.losses.loss_module import LossSystem
    from titok_tpu.models.titok import make_titok
    from titok_tpu.training.train_step import TrainStepBuilder

    patch = (4, 8, 8)
    rng = np.random.default_rng(0)
    grid = (clip[0] // patch[0]) * (clip[1] // patch[1]) * (clip[2] // patch[2])
    per = grid + token_count
    n = seq_len // per
    vids = [rng.uniform(-1, 1, size=(3, *clip)).astype(np.float32)
            for _ in range(n)]
    batch = pack_samples(vids, [token_count] * n, seq_len=seq_len,
                         max_samples=max(n, 1), patch_size=patch)

    cfg = _bench_config(seq_len, (token_count, token_count),
                        model_size=model_size, clip=clip, remat=remat)
    cfg.set_dotted("tokenizer.losses.disc_weight", 0.4)
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    builder = TrainStepBuilder(model, ls, cfg)
    disc = build_disc_batch(batch, ls.disc_tokens)
    arrs = jax.device_put(batch.device_arrays())
    disc_arrs = jax.device_put(disc.device_arrays())
    state0 = builder.init_state(jax.random.PRNGKey(0), arrs, disc_arrs)
    step_fn = builder.make_train_step({})

    results = {} if results is None else results
    for k in ks:
        def k_program(state, arrs, disc_arrs, k=k):
            def body(st, _):
                st, metrics, _ = step_fn(st, arrs, disc_arrs, None)
                return st, metrics["gen/total_loss"]

            st, losses = jax.lax.scan(body, state, None, length=k)
            return st, losses[-1]

        prog = jax.jit(k_program)
        st, loss = prog(state0, arrs, disc_arrs)   # compile + warm
        _ = np.asarray(loss)
        dispatches = total_steps // k
        steps_run = dispatches * k  # only full dispatches execute
        st = state0
        t0 = time.perf_counter()
        for _ in range(dispatches):
            st, loss = prog(st, arrs, disc_arrs)
        _ = np.asarray(loss)                       # force completion
        dt = time.perf_counter() - t0
        line = {
            "metric": f"train-step L1+GAN steps_per_call={k} ({tag}, "
                      f"{clip[0]}x{clip[1]}^2 clips, seq {seq_len})",
            "value": round(n * steps_run / dt, 3),
            "unit": "clips/sec/chip",
            "step_ms": round(dt / steps_run * 1e3, 2),
            "dispatches": dispatches,
        }
        results[f"spc_{model_size}_{k}"] = line
        print(json.dumps(line), file=sys.stderr, flush=True)
        json.dump(results, open(SPC_LAST_PATH, "w"))
    return results


LARGE_LAST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LARGE_LAST.json")


def bench_large(out=None):
    """Large-scale bench suite (configs/large.yaml: 24L/1024w tokenizer,
    FSQ 16k, remat). Gated behind TITOK_BENCH_LARGE=1 for the same reason
    as bench_base — the compiles are heavy remote programs; run it
    manually when the chip is otherwise idle, not from the driver's
    default bench. The GAN variant additionally remats the large
    discriminator (6 forwards over the stacked buffer)."""
    import sys

    results = {}
    results["large_forward"] = bench_base_forward(
        model_size="large", quantizer="fsq", label="large cfg, FSQ 16k",
        iters=4)
    print(json.dumps(results["large_forward"]), file=sys.stderr, flush=True)
    json.dump(results, open(LARGE_LAST_PATH, "w"))
    for variant in ("L1", "L1+GAN"):
        try:
            r = bench_train(seq_len=8192, clip=(16, 160, 160), iters=3,
                            model_size="large", remat=True,
                            variants=(variant,), tag="large cfg remat")
            results.update({f"large_{k}": v for k, v in r.items()})
        except Exception as e:  # e.g. HBM OOM: record, keep the suite going
            msg = str(e).splitlines()[:3]
            results[f"large_{variant}"] = {
                "metric": f"train-step {variant} (large cfg remat)",
                "value": 0.0, "error": " ".join(msg)[:500],
            }
            print(json.dumps(results[f"large_{variant}"]), file=sys.stderr,
                  flush=True)
        json.dump(results, open(LARGE_LAST_PATH, "w"))
    return results


def bench_host_pipeline(seconds=6.0, clip_hw=192, clip_frames=64):
    """Host decode -> chunk (native crop+resize) -> pack throughput on one
    worker, no TPU involved. The host pipeline is the practical bottleneck
    of real training on weak hosts (CLAUDE.md measured numbers), so the
    bench artifact tracks it alongside device throughput."""
    import tempfile

    from titok_tpu.data.chunking import iter_video_chunks
    from titok_tpu.data.packing import pack_samples
    from titok_tpu.data.video_reader import VideoReader, encode_video

    rng = np.random.default_rng(0)
    # temporally-coherent content (running average of noise) so codec
    # decode cost resembles real video rather than worst-case iid noise
    frames = np.empty((clip_frames, clip_hw, clip_hw, 3), np.uint8)
    acc = rng.uniform(0, 255, size=(clip_hw, clip_hw, 3))
    for t in range(clip_frames):
        acc = 0.9 * acc + 0.1 * rng.uniform(0, 255, size=acc.shape)
        frames[t] = acc.astype(np.uint8)
    path = os.path.join(tempfile.gettempdir(), "titok_bench_clip.mp4")
    encode_video(path, frames, fps=8)

    sampling = dict(patch_size=(4, 8, 8), min_grid=(8, 64, 64),
                    max_grid=(16, 128, 128), fps_range=(3, 5),
                    max_aspect_ratio=2.0, min_scale=0.25)
    n_clips = n_tokens = 0
    vids, tcs = [], []
    deadline = time.perf_counter() + seconds
    t0 = time.perf_counter()
    while time.perf_counter() < deadline:
        reader = VideoReader(path)
        for chunk in iter_video_chunks(
            reader, rng=rng, eval=False, **sampling
        ):
            v = chunk["video"]
            grid = ((v.shape[0] // 4) * (v.shape[1] // 8) * (v.shape[2] // 8))
            vids.append(np.transpose(v, (3, 0, 1, 2)).astype(np.float32)
                        / 127.5 - 1.0)
            tcs.append(64)
            n_clips += 1
            n_tokens += grid + 64
            # flush on the sample cap too: small chunks can hit 16 clips
            # before the token budget trips (pack_samples raises past
            # max_samples)
            if len(vids) >= 16 or sum(
                x.shape[1] * (x.shape[2] // 8) * (x.shape[3] // 8) // 4
                for x in vids
            ) + 64 * len(vids) > 6144:
                pack_samples(vids, tcs, seq_len=8192, max_samples=16,
                             patch_size=(4, 8, 8))
                vids, tcs = [], []
        reader.close()
    dt = time.perf_counter() - t0
    return {
        "metric": "host pipeline decode+chunk+pack (1 worker)",
        "value": round(n_clips / dt, 2),
        "unit": "clips/sec/worker",
        "tokens_per_sec": round(n_tokens / dt, 1),
    }


def main():
    import jax

    from titok_tpu.train_utils.compile_cache import setup_compilation_cache

    setup_compilation_cache()  # warm restarts skip remote recompiles
    timer = _watchdog()
    iters = 20
    fn, params, arrs, clips_per_batch = build_bench(iters=iters)

    # warmup: compile + one full chained run, fetched
    _ = np.asarray(fn(params, arrs)[0])

    def timed_run():
        t0 = time.perf_counter()
        out = fn(params, arrs)
        _ = np.asarray(out[0])  # forces completion across the tunnel
        return clips_per_batch * iters / (time.perf_counter() - t0)

    clips_per_sec = timed_run()

    # Contention guard (rounds 3+4 both shipped corrupted canonical
    # forward numbers — a replay and a chip shared with a training run).
    # If the measurement is far below the last recorded one, someone else
    # is probably on the chip: re-measure with backoff, keep the best, and
    # annotate if it never recovers. The annotation makes a contended
    # artifact self-describing instead of silently wrong.
    note = None
    prior = None
    if os.path.exists(LAST_PATH):
        try:
            prior = float(json.load(open(LAST_PATH)).get("value") or 0)
        except Exception:
            prior = None
    if prior and clips_per_sec < 0.5 * prior:
        for wait in (30, 120):
            time.sleep(wait)
            clips_per_sec = max(clips_per_sec, timed_run())
            if clips_per_sec >= 0.5 * prior:
                break
        if clips_per_sec < 0.5 * prior:
            note = (f"suspect contention: measured {clips_per_sec:.1f} "
                    f"clips/s vs {prior:.1f} last recorded; best of 3 "
                    "timed runs with 30/120 s backoff")

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
    if note:
        result["note"] = note
    # a contended number must not become the next run's "last good" bar
    if note is None:
        json.dump(result, open(LAST_PATH, "w"))
    print(json.dumps(result), flush=True)

    # train-step metrics (stderr; own watchdog so a wedge can't retract the
    # already-printed stdout line)
    if os.environ.get("TITOK_BENCH_TRAIN", "1") != "0":
        import sys

        def train_fallback():
            note = {"metric": "train-step bench", "value": 0.0,
                    "note": "TPU relay unreachable during train bench"}
            if os.path.exists(TRAIN_LAST_PATH):
                note = json.load(open(TRAIN_LAST_PATH))
                note["note"] = ("relay unreachable; last recorded train "
                                "measurement")
            print(json.dumps(note), file=sys.stderr, flush=True)
            os._exit(0)

        import threading

        t = threading.Timer(WATCHDOG_S, train_fallback)
        t.daemon = True
        t.start()
        try:
            results = bench_train()
            json.dump(results, open(TRAIN_LAST_PATH, "w"))
        finally:
            t.cancel()

    # int8 serving forward (stderr; same workload with w8a8 Dense layers —
    # serving-path evidence, not the headline metric)
    if os.environ.get("TITOK_BENCH_INT8", "1") != "0":
        import sys
        import threading

        def int8_fallback():
            print(json.dumps({"metric": "int8 serving forward", "value": 0.0,
                              "note": "relay unreachable during int8 bench"}),
                  file=sys.stderr, flush=True)
            os._exit(0)

        t = threading.Timer(WATCHDOG_S, int8_fallback)
        t.daemon = True
        t.start()
        try:
            qfn, qparams, qarrs, qn = build_bench(iters=iters, quant="w8a8")
            _ = np.asarray(qfn(qparams, qarrs)[0])  # compile + warm
            tq = time.perf_counter()
            _ = np.asarray(qfn(qparams, qarrs)[0])
            dq = time.perf_counter() - tq
            line = {
                "metric": "clips/sec/chip encode+decode int8-w8a8 serving "
                          "(tiny cfg, 8x128^2 clips, seq 6144)",
                "value": round(qn * iters / dq, 3),
                "unit": "clips/sec/chip",
                "vs_bf16_forward": round((qn * iters / dq) / clips_per_sec, 4),
            }
            print(json.dumps(line), file=sys.stderr, flush=True)
        except Exception as e:  # never fail the bench over the int8 line
            print(json.dumps({"metric": "int8 serving forward", "value": 0.0,
                              "note": f"failed: {e}"}), file=sys.stderr,
                  flush=True)
        finally:
            t.cancel()

    # base-scale suite (opt-in: heavy remote compiles, see bench_base)
    if os.environ.get("TITOK_BENCH_BASE", "0") == "1":
        import sys
        import threading

        def base_fallback():
            note = {"metric": "base-scale bench", "value": 0.0,
                    "note": "TPU relay unreachable during base bench"}
            if os.path.exists(BASE_LAST_PATH):
                note = json.load(open(BASE_LAST_PATH))
                note["note"] = ("relay unreachable; last recorded base "
                                "measurements")
            print(json.dumps(note), file=sys.stderr, flush=True)
            os._exit(0)

        t = threading.Timer(WATCHDOG_S * 4, base_fallback)
        t.daemon = True
        t.start()
        try:
            bench_base()
        finally:
            t.cancel()

    # steps_per_call K-sweep (opt-in, heavy remote compile of the K=8
    # base program)
    if os.environ.get("TITOK_BENCH_SPC", "0") == "1":
        import sys
        import threading

        def spc_fallback():
            note = {"metric": "steps_per_call bench", "value": 0.0,
                    "note": "TPU relay unreachable during spc bench"}
            if os.path.exists(SPC_LAST_PATH):
                note = json.load(open(SPC_LAST_PATH))
                note["note"] = ("relay unreachable; last recorded spc "
                                "measurements")
            print(json.dumps(note), file=sys.stderr, flush=True)
            os._exit(0)

        t = threading.Timer(WATCHDOG_S * 4, spc_fallback)
        t.daemon = True
        t.start()
        try:
            # tiny inline (light compile, the production r4 shape); the
            # heavy base program in a FRESH subprocess — by this point
            # main() holds forward+train+int8 state on the chip and the
            # base K=8 remat program OOMs HBM beside it (hit 2026-08-21)
            bench_steps_per_call(
                seq_len=6144, clip=(8, 128, 128), model_size="tiny",
                remat=False, tag="tiny cfg")
            import subprocess

            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--spc-base"],
                timeout=WATCHDOG_S * 4,
            )
        finally:
            t.cancel()

    # large-scale suite (opt-in, same wedge caveats as base)
    if os.environ.get("TITOK_BENCH_LARGE", "0") == "1":
        import sys
        import threading

        def large_fallback():
            note = {"metric": "large-scale bench", "value": 0.0,
                    "note": "TPU relay unreachable during large bench"}
            if os.path.exists(LARGE_LAST_PATH):
                note = json.load(open(LARGE_LAST_PATH))
                note["note"] = ("relay unreachable; last recorded large "
                                "measurements")
            print(json.dumps(note), file=sys.stderr, flush=True)
            os._exit(0)

        t = threading.Timer(WATCHDOG_S * 4, large_fallback)
        t.daemon = True
        t.start()
        try:
            bench_large()
        finally:
            t.cancel()

    # host pipeline (no TPU; can't wedge)
    if os.environ.get("TITOK_BENCH_HOST", "1") != "0":
        import sys

        try:
            print(json.dumps(bench_host_pipeline()), file=sys.stderr,
                  flush=True)
        except Exception as e:  # never fail the bench over the host line
            print(json.dumps({"metric": "host pipeline", "value": 0.0,
                              "note": f"failed: {e}"}), file=sys.stderr,
                  flush=True)


if __name__ == "__main__":
    import sys

    if "--spc-base" in sys.argv:
        # fresh-process leg of the SPC sweep (see the TITOK_BENCH_SPC
        # gate): merge into the artifact the tiny leg already wrote
        prior = {}
        if os.path.exists(SPC_LAST_PATH):
            try:
                prior = json.load(open(SPC_LAST_PATH))
            except Exception:
                prior = {}
        bench_steps_per_call(results=prior)
    else:
        main()
