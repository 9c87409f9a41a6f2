"""PackedBatch: the core TPU-native data structure, and the host-side packer.

The reference trains on *lists* of differently-shaped clips attended with
flash-attn varlen (block-diagonal ``cu_seqlens``) under a sequence budget
(reference ``dataset/video_dataset.py:130-172``, ``model/base/blocks.py:80-97``).
XLA wants static shapes, so here a batch IS a fixed ``[S, ...]`` buffer:

    slot layout per sample b (contiguous):  [latent tokens (tc_b) | patches (gs_b)]
    samples concatenated in order, padding (segment 0) at the end.

- ``segment_ids``  int32 [S]: 1-based sample id, 0 = padding. Attention
  masks ``seg[i] != seg[j]`` — exactly the reference's block-diagonal varlen
  mask (``blocks.py:82-86``) but as data, not shape.
- ``token_mask``   bool [S]: True at latent-token slots — the reference's
  interleave ``mask`` (``blocks.py:85-86``).
- ``patches``      [S, P]: patchified pixels at patch slots (zeros at token
  and pad slots); P = prod(patch_size) * in_channels.
- ``rope_cos/sin`` f32 [S, R]: per-slot rotary tables, host-precomputed in
  float64 (see ``titok_tpu/models/rope.py``).

Everything the jitted step needs is in the buffers; batch size varies per
step only through ``segment_ids`` content, never through shapes, so every
train step reuses one compiled SPMD program.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable, Iterator, Sequence

import numpy as np

from titok_tpu.models.rope import positions_for_sample, rope_cos_sin
from titok_tpu.ops.patchify import (
    decode_rows,
    patchify,
    patchify_thwc_u8,
    unpatchify,
)

try:  # bf16 host buffers halve H2D bytes; ml_dtypes ships with jax
    import ml_dtypes

    _BF16 = ml_dtypes.bfloat16
except Exception:  # pragma: no cover
    _BF16 = np.float32

HOST_DTYPES = {
    "bf16": _BF16,
    "16": np.float16,
    "32": np.float32,
    "64": np.float64,
}


def host_dtype(precision: str):
    """Map a config precision string ('bf16-mixed', '32', ...) to a numpy dtype
    (reference ``dataset/video_dataset.py:24-35``)."""
    return HOST_DTYPES[str(precision).split("-")[0]]


def wire_dtype(config):
    """Host-buffer dtype for packed pixel rows. ``dataset.uint8_wire: true``
    ships raw pixel bytes and normalizes on device (``decode_rows``):
    4x less host->device traffic than f32, 2x less than bf16, and MORE
    accurate than a bf16 wire (the bf16 round of the normalized value is
    skipped; sources are uint8 video anyway). Default off: the float wire
    is the reference-shaped layout (``video_dataset.py:24-35``)."""
    if bool(config.dataset.get("uint8_wire", False)):
        return np.uint8
    return host_dtype(config.training.main.precision)


@dataclasses.dataclass
class PackedBatch:
    """Host-side packed batch. All arrays are numpy with static shapes."""

    patches: np.ndarray       # [S, P] compute dtype
    segment_ids: np.ndarray   # int32 [S]
    token_mask: np.ndarray    # bool  [S]
    rope_cos: np.ndarray      # f32   [S, R]
    rope_sin: np.ndarray      # f32   [S, R]
    token_counts: np.ndarray  # int32 [Bmax]   (0 at unused sample rows)
    grid_sizes: np.ndarray    # int32 [Bmax]   patches per sample
    grids: np.ndarray         # int32 [Bmax, G] patch-grid shape per sample
    sample_valid: np.ndarray  # bool  [Bmax]
    fps: np.ndarray           # f32   [Bmax]   source fps (for logging/eval)

    @property
    def seq_len(self) -> int:
        return int(self.patches.shape[0])

    @property
    def max_samples(self) -> int:
        return int(self.token_counts.shape[0])

    @property
    def num_samples(self) -> int:
        return int(self.sample_valid.sum())

    def device_arrays(self) -> dict:
        """The pytree shipped to the device (everything jit consumes)."""
        return {
            "patches": self.patches,
            "segment_ids": self.segment_ids,
            "token_mask": self.token_mask,
            "rope_cos": self.rope_cos,
            "rope_sin": self.rope_sin,
            "token_counts": self.token_counts,
            "grid_sizes": self.grid_sizes,
            "sample_valid": self.sample_valid,
        }


def max_samples_for(seq_len: int, min_grid: Sequence[int], patch_size: Sequence[int],
                    min_tokens: int = 1) -> int:
    """Static upper bound on samples per batch under the budget."""
    min_cost = math.prod(g // p for g, p in zip(min_grid, patch_size)) + max(1, min_tokens)
    return max(1, seq_len // min_cost)


def sample_offsets(token_counts: np.ndarray, grid_sizes: np.ndarray) -> np.ndarray:
    """Start slot of each sample: cumsum of (tc + gs) (ref ``blocks.py:82-83``)."""
    seq_lens = np.asarray(token_counts) + np.asarray(grid_sizes)
    return np.concatenate([[0], np.cumsum(seq_lens)]).astype(np.int64)


class GridOnly:
    """Grid-shaped placeholder accepted wherever ``pack_samples`` takes a
    video: reserves the sample's budget slots (token + patch rows) but
    writes no pixel rows (they stay zero). Serving ``/decode`` packs
    these — the decoder replaces patch slots with the mask token, so
    their values are irrelevant, and allocating + patchifying dummy
    pixel buffers was pure host-side waste."""

    def __init__(self, dims: Sequence[int], channels: int = 3):
        self.dims = tuple(int(d) for d in dims)
        self.channels = int(channels)


def video_dims(vid) -> tuple[int, ...]:
    """Pixel dims (T, H, W) of a clip in either accepted layout:
    float CTHW (the reference's layout) or uint8 THWC (decoder output)."""
    if isinstance(vid, GridOnly):
        return vid.dims
    if vid.dtype == np.uint8 and vid.ndim == 4 and vid.shape[-1] in (1, 3):
        return tuple(vid.shape[:3])
    return tuple(vid.shape[1:])


def _video_rows(vid: np.ndarray, patch_size: Sequence[int], dtype=None) -> np.ndarray:
    """Patchified rows for a clip.

    Float wire (default): [-1,1] rows — uint8 THWC goes through the fused
    C++ normalize+patchify kernel, float CTHW through numpy patchify.

    uint8 wire (``dtype=np.uint8``): raw pixel-byte rows — uint8 THWC is a
    pure host-side byte shuffle (``patchify_thwc_u8``); a float source
    (synthetic streams) is quantized back to pixel bytes so every batch of
    a run keeps ONE wire dtype (a per-batch dtype flip would recompile the
    jitted step)."""
    if dtype == np.uint8:
        if vid.dtype == np.uint8 and vid.ndim == 4 and vid.shape[-1] in (1, 3):
            return patchify_thwc_u8(vid, patch_size)
        rows = patchify(np.asarray(vid, np.float32), patch_size)
        return np.clip(np.rint((rows + 1.0) * 127.5), 0, 255).astype(np.uint8)
    if vid.dtype == np.uint8 and vid.ndim == 4 and vid.shape[-1] in (1, 3):
        try:
            from titok_tpu.data.video_reader import patchify_normalize

            return patchify_normalize(vid, patch_size)
        except Exception:
            vidf = vid.astype(np.float32).transpose(3, 0, 1, 2) / 255 * 2 - 1
            return patchify(vidf, patch_size)
    return patchify(np.asarray(vid), patch_size)


def pack_samples(
    videos: Sequence[np.ndarray],
    token_counts: Sequence[int],
    *,
    seq_len: int,
    max_samples: int,
    patch_size: Sequence[int],
    head_dim: int = 64,
    fps: Sequence[float] | None = None,
    dtype=np.float32,
) -> PackedBatch:
    """Pack a list of CTHW (or C,*dims) videos into one PackedBatch.

    Equivalent information to the reference batch dict
    ``{'video': [CTHW...], 'token_counts': int32[B]}``
    (``video_dataset.py:160-164``) but in fixed-shape buffers.
    """
    n_dims = len(patch_size)
    B = len(videos)
    assert B == len(token_counts) and B <= max_samples, (B, max_samples)
    v0 = videos[0]
    if isinstance(v0, GridOnly):
        c = v0.channels
    elif v0.dtype == np.uint8 and v0.ndim == 4:
        c = v0.shape[-1]
    else:
        c = v0.shape[0]
    p_elems = int(math.prod(patch_size)) * c

    grids = np.zeros((max_samples, n_dims), dtype=np.int32)
    tcs = np.zeros((max_samples,), dtype=np.int32)
    gss = np.zeros((max_samples,), dtype=np.int32)
    valid = np.zeros((max_samples,), dtype=bool)
    fps_arr = np.zeros((max_samples,), dtype=np.float32)

    patches = np.zeros((seq_len, p_elems), dtype=dtype)
    segment_ids = np.zeros((seq_len,), dtype=np.int32)
    token_mask = np.zeros((seq_len,), dtype=bool)

    rot_pairs = (head_dim // (n_dims * 2)) * n_dims
    positions = np.zeros((seq_len, n_dims), dtype=np.float64)

    offset = 0
    for b, (vid, tc) in enumerate(zip(videos, token_counts)):
        tc = int(tc)
        grid = [d // p for d, p in zip(video_dims(vid), patch_size)]
        gs = int(math.prod(grid))
        end = offset + tc + gs
        assert end <= seq_len, f"packed length {end} exceeds budget {seq_len}"

        grids[b] = grid
        tcs[b] = tc
        gss[b] = gs
        valid[b] = True
        if fps is not None:
            fps_arr[b] = fps[b]

        segment_ids[offset:end] = b + 1
        token_mask[offset : offset + tc] = True
        if not isinstance(vid, GridOnly):
            patches[offset + tc : end] = _video_rows(
                vid, patch_size, dtype).astype(dtype)
        positions[offset:end] = positions_for_sample(grid, tc)
        offset = end

    cos, sin = rope_cos_sin(positions, head_dim, n_dims)
    # zero the rotary tables at padding so pad slots carry no position signal
    pad = segment_ids == 0
    cos[pad] = 1.0
    sin[pad] = 0.0
    assert cos.shape[1] == rot_pairs

    return PackedBatch(
        patches=patches,
        segment_ids=segment_ids,
        token_mask=token_mask,
        rope_cos=cos,
        rope_sin=sin,
        token_counts=tcs,
        grid_sizes=gss,
        grids=grids,
        sample_valid=valid,
        fps=fps_arr,
    )


def unpack_videos(
    recon_patches: np.ndarray, batch: PackedBatch, patch_size: Sequence[int],
    channels: int = 3,
) -> list[np.ndarray]:
    """Slice per-sample patch rows out of ``[S, P]`` and unpatchify to videos
    (the host-side analog of reference ``blocks.py:171-177``)."""
    offs = sample_offsets(batch.token_counts, batch.grid_sizes)
    out = []
    for b in range(batch.num_samples):
        start = offs[b] + int(batch.token_counts[b])
        gs = int(batch.grid_sizes[b])
        rows = np.asarray(recon_patches[start : start + gs], dtype=np.float32)
        out.append(unpatchify(rows, batch.grids[b], patch_size, channels))
    return out


def unpack_indices(indices: np.ndarray, batch: PackedBatch) -> list[np.ndarray]:
    """Per-sample latent token indices from a full-buffer [S] index array
    (reference ``titok.py:47-52`` ``split_indices=True``)."""
    offs = sample_offsets(batch.token_counts, batch.grid_sizes)
    out = []
    for b in range(batch.num_samples):
        start = offs[b]
        tc = int(batch.token_counts[b])
        out.append(np.asarray(indices[start : start + tc], dtype=np.int32))
    return out


@dataclasses.dataclass
class DiscBatch:
    """Packed layout for the discriminator pass (reference
    ``loss_module.py:42-48,96-101``): same clips, but every sample gets a
    fixed ``disc_tokens`` register tokens instead of its variable latent
    count. Patch pixels are not re-shipped — ``patch_gather`` maps disc
    patch slots back to tokenizer slots so both the target buffer and the
    on-device reconstruction can be regathered for the 5 disc forwards."""

    patch_gather: np.ndarray  # int32 [Sd] -> slot in [S] (0 at token/pad slots)
    is_patch: np.ndarray      # bool [Sd]
    segment_ids: np.ndarray   # int32 [Sd]
    token_mask: np.ndarray    # bool [Sd]
    rope_cos: np.ndarray      # f32 [Sd, R]
    rope_sin: np.ndarray      # f32 [Sd, R]
    sample_valid: np.ndarray  # bool [Bmax]

    def device_arrays(self) -> dict:
        return dataclasses.asdict(self)


def build_disc_batch(batch: PackedBatch, disc_tokens: int = 4,
                     head_dim: int = 64, pad_to: int = 1) -> DiscBatch:
    """Build the disc-side packing plan from a tokenizer PackedBatch.

    ``pad_to``: round the disc buffer length up to a multiple (context
    parallelism shards the [Sd] axis, which must divide evenly)."""
    Bmax = batch.max_samples
    S = batch.seq_len
    Sd = S + disc_tokens * Bmax
    Sd = ((Sd + pad_to - 1) // pad_to) * pad_to
    n_dims = batch.grids.shape[1]

    patch_gather = np.zeros((Sd,), np.int32)
    is_patch = np.zeros((Sd,), bool)
    segment_ids = np.zeros((Sd,), np.int32)
    token_mask = np.zeros((Sd,), bool)
    positions = np.zeros((Sd, n_dims), np.float64)

    offs = sample_offsets(batch.token_counts, batch.grid_sizes)
    d_off = 0
    for b in range(batch.num_samples):
        gs = int(batch.grid_sizes[b])
        tc = int(batch.token_counts[b])
        end = d_off + disc_tokens + gs
        segment_ids[d_off:end] = b + 1
        token_mask[d_off : d_off + disc_tokens] = True
        src_start = int(offs[b]) + tc
        patch_gather[d_off + disc_tokens : end] = np.arange(src_start, src_start + gs)
        is_patch[d_off + disc_tokens : end] = True
        positions[d_off:end] = positions_for_sample(batch.grids[b], disc_tokens)
        d_off = end

    cos, sin = rope_cos_sin(positions, head_dim, n_dims)
    pad = segment_ids == 0
    cos[pad] = 1.0
    sin[pad] = 0.0

    return DiscBatch(
        patch_gather=patch_gather,
        is_patch=is_patch,
        segment_ids=segment_ids,
        token_mask=token_mask,
        rope_cos=cos,
        rope_sin=sin,
        sample_valid=batch.sample_valid.copy(),
    )


class Packer:
    """Streaming dynamic packer (reference ``_dynamic_batching``,
    ``video_dataset.py:130-172``).

    Pulls ``{'video', 'fps'}`` samples from an iterator, assigns each a
    random token count from ``token_range``, packs until the budget would be
    exceeded, then emits a PackedBatch. The overflowing sample is carried
    into the next batch; a partial final batch is dropped (generator never
    ends mid-stream in training).
    """

    def __init__(
        self,
        *,
        seq_len: int,
        token_range: Sequence[int],
        patch_size: Sequence[int],
        min_grid: Sequence[int],
        head_dim: int = 64,
        dtype=np.float32,
        max_samples: int | None = None,
        rng: np.random.Generator | None = None,
        flush_final: bool = False,
    ):
        self.seq_len = int(seq_len)
        self.token_range = (int(token_range[0]), int(token_range[1]))
        self.patch_size = list(patch_size)
        self.head_dim = head_dim
        self.dtype = dtype
        self.max_samples = max_samples or max_samples_for(
            seq_len, min_grid, patch_size, self.token_range[0]
        )
        self.rng = rng or np.random.default_rng()
        # the reference drops the partial final batch (fine for an infinite
        # training stream, silently loses eval samples); eval passes
        # flush_final=True to emit it
        self.flush_final = flush_final

    def __call__(self, stream: Iterable[dict]) -> Iterator[PackedBatch]:
        videos: list[np.ndarray] = []
        tcs: list[int] = []
        fps: list[float] = []
        cur = 0
        for sample in stream:
            vid = sample["video"]
            gs = math.prod(d // p for d, p in zip(video_dims(vid), self.patch_size))
            tc = int(self.rng.integers(self.token_range[0], self.token_range[1] + 1))
            if gs + tc > self.seq_len:  # can never fit; drop with a warning
                print(f"packer: dropping oversized clip ({gs} grid + {tc} "
                      f"tokens > budget {self.seq_len})")
                continue
            if cur + gs + tc > self.seq_len or len(videos) >= self.max_samples:
                if videos:
                    yield pack_samples(
                        videos, tcs, seq_len=self.seq_len,
                        max_samples=self.max_samples, patch_size=self.patch_size,
                        head_dim=self.head_dim, fps=fps, dtype=self.dtype,
                    )
                videos, tcs, fps, cur = [], [], [], 0
            cur += gs + tc
            videos.append(vid)
            tcs.append(tc)
            fps.append(float(sample.get("fps", 0.0)))
        if self.flush_final and videos:
            yield pack_samples(
                videos, tcs, seq_len=self.seq_len,
                max_samples=self.max_samples, patch_size=self.patch_size,
                head_dim=self.head_dim, fps=fps, dtype=self.dtype,
            )
