"""uint8 wire format: raw pixel bytes ship to device; normalization happens
on device (``decode_rows``, fused into proj_in / loss by XLA).

Why: packed pixel rows dominate host->device bytes per step. Shipping the
source's native uint8 is 4x smaller than f32 (2x vs bf16) and skips the
bf16 rounding of normalized values entirely — strictly more accurate AND
cheaper. Gated by ``dataset.uint8_wire`` (default off = reference-shaped
float wire, ``video_dataset.py:24-35``)."""

import numpy as np
import pytest

import jax

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import build_disc_batch, pack_samples, wire_dtype
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.models.titok import make_titok
from titok_tpu.ops.patchify import decode_rows, patchify, patchify_thwc_u8
from titok_tpu.training.train_step import TrainStepBuilder


def uint8_videos(rng, n=3, patch=PATCH):
    """Random uint8 THWC clips with patch-multiple dims (decoder layout)."""
    vids = []
    for _ in range(n):
        t = patch[0] * int(rng.integers(1, 3))
        h = patch[1] * int(rng.integers(2, 5))
        w = patch[2] * int(rng.integers(2, 5))
        vids.append(rng.integers(0, 256, size=(t, h, w, 3), dtype=np.uint8))
    return vids


def test_patchify_thwc_u8_layout(rng):
    """u8 rows decode to exactly the float pipeline's normalized rows
    (same grid-row-major, channel-fastest layout as ops.patchify)."""
    vid = rng.integers(0, 256, size=(4, 16, 12, 3), dtype=np.uint8)
    rows_u8 = patchify_thwc_u8(vid, PATCH)
    assert rows_u8.dtype == np.uint8

    vidf = vid.astype(np.float32).transpose(3, 0, 1, 2) / 255 * 2 - 1
    expected = patchify(vidf, PATCH)
    np.testing.assert_allclose(
        decode_rows(rows_u8, np.float32), expected, atol=1e-6
    )


def test_pack_uint8_wire_matches_float_wire(rng):
    """Packing the same u8 clips through both wires yields identical
    normalized patch rows; only token/pad slots differ (0 bytes decode to
    -1 there — every consumer masks those slots)."""
    vids = uint8_videos(rng)
    tcs = [int(rng.integers(1, 8)) for _ in vids]
    kw = dict(seq_len=128, max_samples=8, patch_size=PATCH)
    b8 = pack_samples(vids, tcs, dtype=np.uint8, **kw)
    bf = pack_samples(vids, tcs, dtype=np.float32, **kw)

    assert b8.patches.dtype == np.uint8
    np.testing.assert_array_equal(b8.segment_ids, bf.segment_ids)
    patch_slots = (~b8.token_mask) & (b8.segment_ids > 0)
    np.testing.assert_allclose(
        decode_rows(b8.patches, np.float32)[patch_slots],
        bf.patches[patch_slots], atol=1e-6,
    )


def test_float_source_quantizes_to_uint8_wire(rng):
    """A float-CTHW source (synthetic streams) on the u8 wire is quantized
    to pixel bytes — lossy by at most half a pixel step, but keeps one wire
    dtype per run (a per-batch dtype flip would recompile the step)."""
    vids = synthetic_videos(rng)
    tcs = [2 for _ in vids]
    kw = dict(seq_len=128, max_samples=8, patch_size=PATCH)
    b8 = pack_samples(vids, tcs, dtype=np.uint8, **kw)
    bf = pack_samples(vids, tcs, dtype=np.float32, **kw)
    patch_slots = (~b8.token_mask) & (b8.segment_ids > 0)
    np.testing.assert_allclose(
        decode_rows(b8.patches, np.float32)[patch_slots],
        bf.patches[patch_slots], atol=1.01 / 255,
    )


def test_wire_dtype_config():
    cfg = tiny_config()
    assert wire_dtype(cfg) == np.float32
    cfg = tiny_config(**{"dataset.uint8_wire": True})
    assert wire_dtype(cfg) == np.uint8
    cfg = tiny_config(**{"training.main.precision": "bf16-mixed"})
    assert np.dtype(wire_dtype(cfg)).itemsize == 2  # bf16 host buffers


def test_train_step_equivalent_between_wires(rng):
    """The full GAN train step produces the same losses on either wire
    (up to normalize-formula ulp): device-side decode is a drop-in for the
    host-side normalize."""
    cfg = tiny_config(**{"tokenizer.losses.disc_weight": 0.4})
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    builder = TrainStepBuilder(model, ls, cfg)

    vids = uint8_videos(rng)
    tcs = [int(rng.integers(1, 8)) for _ in vids]
    kw = dict(seq_len=cfg.training.sampling.train_seq_len, max_samples=8,
              patch_size=PATCH)

    metrics = {}
    for name, dtype in [("f32", np.float32), ("u8", np.uint8)]:
        batch = pack_samples(vids, tcs, dtype=dtype, **kw)
        disc = build_disc_batch(batch, ls.disc_tokens)
        arrs, darrs = batch.device_arrays(), disc.device_arrays()
        state = builder.init_state(jax.random.PRNGKey(0), arrs, darrs)
        step = jax.jit(builder.make_train_step(lpips_params={}))
        _, m, _ = step(state, arrs, darrs, None)
        metrics[name] = {k: float(v) for k, v in m.items()
                        if np.ndim(v) == 0 and np.issubdtype(
                            np.asarray(v).dtype, np.floating)}

    for k, vf in metrics["f32"].items():
        v8 = metrics["u8"][k]
        assert np.isfinite(v8), k
        np.testing.assert_allclose(v8, vf, rtol=2e-3, atol=1e-5, err_msg=k)


def test_trainer_fit_uint8_wire(tmp_path):
    """2-step fit + final eval with the u8 wire through the real Trainer:
    covers the dataset plumbing (wire_dtype), the jitted step, device-side
    eval metrics, and the host unpack path."""
    from titok_tpu.training.trainer import Trainer

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "dataset.uint8_wire": True,
        "general.checkpoints.save_path": str(tmp_path / "out"),
        "training.main.max_steps": 2,
        "training.eval.eval_step_interval": 2,
        "training.eval.eval_samples": 2,
    })
    t = Trainer(cfg)
    t.fit()
    lines = (tmp_path / "out" / "metrics.jsonl").read_text().splitlines()
    assert lines, "no metrics written"
    import json

    recs = [json.loads(ln) for ln in lines]
    assert any("eval/psnr" in r for r in recs)
    assert all(np.isfinite(r.get("train/gen/total_loss", 0.0)) for r in recs)
