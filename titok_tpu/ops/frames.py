"""Device-side frame extraction + crop/resize from packed patch buffers.

TPU-native replacement for the reference's host-side
``perceptual_preprocess`` (reference ``model/losses/loss_module.py:59-93``):
the reference unbinds frames from each clip, random-resizes (p=0.25 or when
too small) and random-crops ``sample_size²`` windows **on the GPU through
torchvision**, inside the autograd graph. Here the reconstruction only
exists as packed patch rows ``[S, P]`` on device, so frame extraction must
be a static-shape, differentiable gather:

1. The host picks K random (sample, frame) pairs plus crop/resize params
   and emits a :class:`PerceptualPlan` of gather indices (edge-clamped to
   the sample's patch grid) and per-frame scale/translation.
2. On device, :func:`gather_frames` gathers the K frames' patch rows
   ``[K, GH, GW, P]``, slices the temporal sub-offset, and reassembles
   ``[K, Hmax, Wmax, C]`` images.
3. :func:`crop_resize` applies ``jax.image.scale_and_translate`` (bicubic,
   antialias off, matching the reference's BICUBIC/antialias=False) to
   produce the static ``[K, sample_size, sample_size, C]`` LPIPS input.

Everything is dense gathers + two small separable-resize matmuls per frame
— MXU-friendly and fully differentiable back to the generator.

Note: jax's cubic kernel is Keys a=-0.5 vs torch bicubic a=-0.75; the
training-path difference is distributional only (random crops), not an
eval-metric path.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PerceptualPlan:
    """Host-built per-batch plan for K perceptual frames."""

    gather_idx: np.ndarray   # int32 [K, GH, GW] slot ids into [S] (edge-clamped)
    r0: np.ndarray           # int32 [K] temporal offset within the patch
    scale: np.ndarray        # f32 [K, 2] (y, x) resize scale
    translation: np.ndarray  # f32 [K, 2] (y, x) output-space translation
    weight: np.ndarray       # f32 [K] frame weight (0 disables a slot)

    def device_arrays(self) -> dict:
        return dataclasses.asdict(self)


def build_perceptual_plan(
    batch,
    *,
    num_frames: int,
    sample_size: int,
    patch_size: Sequence[int],
    max_grid_hw: Sequence[int],
    resize_prob: float = 0.25,
    rng: np.random.Generator | None = None,
) -> PerceptualPlan:
    """Pick K random frames + crop/resize params (ref ``loss_module.py:59-93``).

    The reference shuffles the flattened frame list of the whole batch and
    keeps the first K+1; we sample K frames uniformly (with replacement when
    the batch holds fewer frames), which has the same expectation for the
    mean loss.
    """
    from titok_tpu.data.packing import sample_offsets

    rng = rng or np.random.default_rng()
    p0, p1, p2 = patch_size
    GH = max_grid_hw[0] // p1
    GW = max_grid_hw[1] // p2
    K = num_frames

    # enumerate frames (b, t) of valid samples
    n = batch.num_samples
    frames = []
    for b in range(n):
        t_pix = int(batch.grids[b][0]) * p0
        frames += [(b, t) for t in range(t_pix)]
    offs = sample_offsets(batch.token_counts, batch.grid_sizes)

    gather_idx = np.zeros((K, GH, GW), np.int32)
    r0 = np.zeros((K,), np.int32)
    scale = np.ones((K, 2), np.float32)
    translation = np.zeros((K, 2), np.float32)
    weight = np.zeros((K,), np.float32)

    if not frames:
        return PerceptualPlan(gather_idx, r0, scale, translation, weight)

    order = rng.permutation(len(frames))
    for ki in range(K):
        b, t = frames[order[ki % len(order)]]
        gt, gh, gw = (int(x) for x in batch.grids[b])
        H, W = gh * p1, gw * p2
        d0, rr0 = t // p0, t % p0

        patch_start = int(offs[b]) + int(batch.token_counts[b])
        hh = np.minimum(np.arange(GH), gh - 1)
        ww = np.minimum(np.arange(GW), gw - 1)
        gather_idx[ki] = (
            patch_start + d0 * (gh * gw) + hh[:, None] * gw + ww[None, :]
        )
        r0[ki] = rr0

        if H < sample_size or W < sample_size or rng.random() < resize_prob:
            # torch Resize(size=s): short side -> s, long side scaled
            s = sample_size / min(H, W)
            Hr, Wr = round(H * s), round(W * s)
            oy = rng.integers(0, Hr - sample_size + 1)
            ox = rng.integers(0, Wr - sample_size + 1)
            scale[ki] = (s, s)
            translation[ki] = (-float(oy), -float(ox))
        else:
            oy = rng.integers(0, H - sample_size + 1)
            ox = rng.integers(0, W - sample_size + 1)
            scale[ki] = (1.0, 1.0)
            translation[ki] = (-float(oy), -float(ox))
        weight[ki] = 1.0

    return PerceptualPlan(gather_idx, r0, scale, translation, weight)


def build_eval_frame_plan(
    batch,
    *,
    num_frames: int,
    patch_size: Sequence[int],
    max_grid_hw: Sequence[int],
) -> PerceptualPlan:
    """Deterministic plan gathering ALL frames of every valid sample
    (identity scale, no crop) for device-side eval metrics. ``num_frames``
    is the static buffer size (use :func:`max_eval_frames`); unused slots
    have weight 0. Frame pixel sizes ride in ``scale`` as (H, W) so the
    device SSIM can mask padding."""
    from titok_tpu.data.packing import sample_offsets

    p0, p1, p2 = patch_size
    GH = max_grid_hw[0] // p1
    GW = max_grid_hw[1] // p2
    K = num_frames

    gather_idx = np.zeros((K, GH, GW), np.int32)
    r0 = np.zeros((K,), np.int32)
    hw = np.ones((K, 2), np.float32)
    translation = np.zeros((K, 2), np.float32)
    weight = np.zeros((K,), np.float32)

    offs = sample_offsets(batch.token_counts, batch.grid_sizes)
    ki = 0
    for b in range(batch.num_samples):
        gt, gh, gw = (int(x) for x in batch.grids[b])
        patch_start = int(offs[b]) + int(batch.token_counts[b])
        hh = np.minimum(np.arange(GH), gh - 1)
        ww = np.minimum(np.arange(GW), gw - 1)
        base = patch_start + hh[:, None] * gw + ww[None, :]
        for t in range(gt * p0):
            assert ki < K, (
                f"eval frame buffer too small: {ki+1} frames > {K}; "
                "raise num_frames (see max_eval_frames)"
            )
            gather_idx[ki] = base + (t // p0) * (gh * gw)
            r0[ki] = t % p0
            hw[ki] = (gh * p1, gw * p2)
            weight[ki] = 1.0
            ki += 1
    return PerceptualPlan(gather_idx, r0, hw, translation, weight)


def max_eval_frames(seq_len: int, min_grid: Sequence[int],
                    patch_size: Sequence[int]) -> int:
    """Static bound on pixel frames in one packed batch: the budget filled
    with minimal-HW samples maximizes frames per slot."""
    p0, p1, p2 = patch_size
    min_hw_slots = (min_grid[1] // p1) * (min_grid[2] // p2)
    return max(p0, (seq_len // min_hw_slots + 1) * p0)


def gather_frames(
    patch_rows: jnp.ndarray,  # [S, P] with P = p0*p1*p2*C (channel fastest)
    plan: dict,
    patch_size: Sequence[int],
    channels: int = 3,
) -> jnp.ndarray:
    """Gather K frames into ``[K, GH*p1, GW*p2, C]`` images."""
    p0, p1, p2 = patch_size
    gi = plan["gather_idx"]  # [K, GH, GW]
    K, GH, GW = gi.shape
    g = patch_rows[gi.reshape(-1)].reshape(K, GH, GW, p0, p1, p2, channels)
    # select temporal sub-offset r0 per frame
    r0 = plan["r0"].reshape(K, 1, 1, 1, 1, 1, 1)
    g = jnp.take_along_axis(g, jnp.broadcast_to(r0, (K, GH, GW, 1, p1, p2, channels)), axis=3)
    g = g[:, :, :, 0]  # [K, GH, GW, p1, p2, C]
    g = jnp.transpose(g, (0, 1, 3, 2, 4, 5))  # [K, GH, p1, GW, p2, C]
    return g.reshape(K, GH * p1, GW * p2, channels)


def crop_resize(
    frames: jnp.ndarray,  # [K, H, W, C]
    plan: dict,
    sample_size: int,
) -> jnp.ndarray:
    """Per-frame bicubic scale+translate to ``[K, s, s, C]``."""

    def one(img, scale, translation):
        return jax.image.scale_and_translate(
            img.astype(jnp.float32),
            shape=(sample_size, sample_size, img.shape[-1]),
            spatial_dims=(0, 1),
            scale=scale,
            translation=translation,
            method="cubic",
            antialias=False,
        )

    return jax.vmap(one)(frames, plan["scale"], plan["translation"])


def extract_perceptual_frames(
    patch_rows: jnp.ndarray,
    plan: dict,
    patch_size: Sequence[int],
    sample_size: int,
    channels: int = 3,
) -> jnp.ndarray:
    """Full pipeline: packed rows -> ``[K, s, s, C]`` float32 frames."""
    imgs = gather_frames(patch_rows, plan, patch_size, channels)
    return crop_resize(imgs, plan, sample_size)
