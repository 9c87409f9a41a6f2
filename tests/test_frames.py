"""Perceptual frame extraction: packed-gather path vs direct per-sample
computation (the TPU-native replacement for reference
``perceptual_preprocess``, loss_module.py:59-93)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from titok_tpu.data.packing import pack_samples
from titok_tpu.ops.frames import (
    PerceptualPlan,
    build_perceptual_plan,
    extract_perceptual_frames,
    gather_frames,
)

PATCH = (2, 4, 4)


def _vid(rng, t, h, w):
    return rng.normal(size=(3, t, h, w)).astype(np.float32)


def test_gather_reconstructs_frames(rng):
    """Gathered frames (before resize) equal the source video frames."""
    vids = [_vid(rng, 4, 8, 12), _vid(rng, 2, 12, 8)]
    batch = pack_samples(vids, [3, 2], seq_len=64, max_samples=4,
                         patch_size=PATCH)
    plan = build_perceptual_plan(
        batch, num_frames=6, sample_size=4, patch_size=PATCH,
        max_grid_hw=(16, 16), resize_prob=0.0, rng=np.random.default_rng(0),
    )
    frames = np.asarray(gather_frames(
        jnp.asarray(batch.patches, jnp.float32), plan.device_arrays(), PATCH
    ))
    # recover which (b, t) each plan row points to and compare the valid crop
    from titok_tpu.data.packing import sample_offsets

    offs = sample_offsets(batch.token_counts, batch.grid_sizes)
    for ki in range(6):
        # locate source sample by the patch_start encoded in gather_idx[0,0]
        slot0 = plan.gather_idx[ki, 0, 0]
        b = int(batch.segment_ids[slot0]) - 1
        gt, gh, gw = batch.grids[b]
        d0 = (slot0 - offs[b] - batch.token_counts[b]) // (gh * gw)
        t = int(d0) * PATCH[0] + int(plan.r0[ki])
        H, W = gh * PATCH[1], gw * PATCH[2]
        src = vids[b][:, t].transpose(1, 2, 0)  # HWC
        np.testing.assert_allclose(frames[ki, :H, :W], src, atol=1e-6)


def test_crop_is_exact_when_scale_one(rng):
    """scale=1 integer-translation crops are exact pixel copies."""
    vids = [_vid(rng, 2, 16, 16)]
    batch = pack_samples(vids, [1], seq_len=80, max_samples=2, patch_size=PATCH)
    plan = build_perceptual_plan(
        batch, num_frames=2, sample_size=8, patch_size=PATCH,
        max_grid_hw=(16, 16), resize_prob=0.0, rng=np.random.default_rng(1),
    )
    out = np.asarray(extract_perceptual_frames(
        jnp.asarray(batch.patches, jnp.float32), plan.device_arrays(),
        PATCH, 8,
    ))
    for ki in range(2):
        assert plan.scale[ki, 0] == 1.0
        oy, ox = -int(plan.translation[ki, 0]), -int(plan.translation[ki, 1])
        t = int(plan.r0[ki])  # single temporal patch here when d0=0
        src = vids[0][:, t].transpose(1, 2, 0)
        np.testing.assert_allclose(out[ki], src[oy:oy + 8, ox:ox + 8],
                                   atol=1e-5)


def test_small_frames_get_resized(rng):
    """Frames below sample_size force the resize path (ref :71-76)."""
    vids = [_vid(rng, 2, 8, 8)]
    batch = pack_samples(vids, [1], seq_len=40, max_samples=2, patch_size=PATCH)
    plan = build_perceptual_plan(
        batch, num_frames=2, sample_size=16, patch_size=PATCH,
        max_grid_hw=(8, 8), resize_prob=0.0, rng=np.random.default_rng(2),
    )
    assert (plan.scale >= 2.0 - 1e-6).all()
    out = np.asarray(extract_perceptual_frames(
        jnp.asarray(batch.patches, jnp.float32), plan.device_arrays(),
        PATCH, 16,
    ))
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(out).all()


def test_gradient_flows_to_patches(rng):
    vids = [_vid(rng, 2, 8, 8)]
    batch = pack_samples(vids, [1], seq_len=40, max_samples=2, patch_size=PATCH)
    plan = build_perceptual_plan(
        batch, num_frames=1, sample_size=8, patch_size=PATCH,
        max_grid_hw=(8, 8), rng=np.random.default_rng(3),
    ).device_arrays()

    def loss(patches):
        f = extract_perceptual_frames(patches, plan, PATCH, 8)
        return (f**2).sum()

    g = jax.grad(loss)(jnp.asarray(batch.patches, jnp.float32))
    assert np.abs(np.asarray(g)).sum() > 0


def test_empty_batch_zero_weights():
    import dataclasses

    empty = PerceptualPlan(
        gather_idx=np.zeros((2, 2, 2), np.int32),
        r0=np.zeros((2,), np.int32),
        scale=np.ones((2, 2), np.float32),
        translation=np.zeros((2, 2), np.float32),
        weight=np.zeros((2,), np.float32),
    )
    assert empty.weight.sum() == 0
