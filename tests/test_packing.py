"""Packer + patchify invariants (reference ``video_dataset.py:130-172``,
``model/base/utils.py:26-51``)."""

import numpy as np

from titok_tpu.data.packing import (
    Packer,
    pack_samples,
    sample_offsets,
    unpack_indices,
    unpack_videos,
)
from titok_tpu.ops.patchify import patchify, unpatchify

PATCH = (4, 8, 8)


def _vid(rng, t, h, w, c=3):
    return rng.normal(size=(c, t, h, w)).astype(np.float32)


def test_patchify_roundtrip(rng):
    v = _vid(rng, 8, 16, 24)
    p = patchify(v, PATCH)
    assert p.shape == (2 * 2 * 3, 4 * 8 * 8 * 3)
    back = unpatchify(p, (2, 2, 3), PATCH, 3)
    np.testing.assert_array_equal(back, v)


def test_patchify_matches_reference_einops():
    """Same layout as the reference einops pattern (utils.py:26-39)."""
    from einops import rearrange

    rng = np.random.default_rng(3)
    v = _vid(rng, 4, 8, 16)
    ours = patchify(v, PATCH)
    theirs = rearrange(
        v, "c (d0 p0) (d1 p1) (d2 p2) -> (d0 d1 d2) (p0 p1 p2 c)",
        p0=4, p1=8, p2=8,
    )
    np.testing.assert_array_equal(ours, theirs)


def test_pack_unpack_roundtrip(rng):
    vids = [_vid(rng, 8, 16, 16), _vid(rng, 4, 8, 24)]
    tcs = [5, 2]
    batch = pack_samples(vids, tcs, seq_len=64, max_samples=4, patch_size=PATCH)
    assert batch.num_samples == 2
    # layout: tokens then patches, contiguous
    offs = sample_offsets(batch.token_counts, batch.grid_sizes)
    assert offs[1] == 5 + 2 * 2 * 2  # tc0 + grid0
    assert batch.token_mask[:5].all() and not batch.token_mask[5:13].any()
    assert (batch.segment_ids[:13] == 1).all()
    # recon roundtrip through packed patch rows
    out = unpack_videos(batch.patches.astype(np.float32), batch, PATCH)
    for a, b in zip(out, vids):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_unpack_indices(rng):
    vids = [_vid(rng, 4, 8, 8), _vid(rng, 4, 8, 8)]
    batch = pack_samples(vids, [3, 4], seq_len=32, max_samples=4, patch_size=PATCH)
    idx = np.arange(32, dtype=np.int32)
    per = unpack_indices(idx, batch)
    np.testing.assert_array_equal(per[0], [0, 1, 2])
    # sample 0 occupies 3 tokens + 1 patch (4x8x8 video = 1 patch) = slots 0..3
    np.testing.assert_array_equal(per[1], [4, 5, 6, 7])


def test_streaming_packer_respects_budget(rng):
    def stream():
        while True:
            yield {"video": _vid(rng, 4, 8, 8), "fps": 4}  # 2 grid tokens each

    packer = Packer(
        seq_len=64, token_range=(1, 8), patch_size=PATCH,
        min_grid=(4, 8, 8), rng=np.random.default_rng(0),
    )
    batches = []
    for b in packer(stream()):
        batches.append(b)
        if len(batches) == 8:
            break
    for b in batches:
        used = int(b.token_counts.sum() + b.grid_sizes.sum())
        assert used <= 64
        assert b.num_samples >= 1
        # never splits a clip: every sample's full grid is present
        assert (b.grid_sizes[b.sample_valid] == 1).all()


def test_pad_rope_is_identity(rng):
    batch = pack_samples([_vid(rng, 4, 8, 8)], [2], seq_len=32, max_samples=2,
                         patch_size=PATCH)
    pad = batch.segment_ids == 0
    assert pad.any()
    np.testing.assert_array_equal(batch.rope_cos[pad], 1.0)
    np.testing.assert_array_equal(batch.rope_sin[pad], 0.0)


def test_grid_only_matches_zero_dummy(rng):
    """A GridOnly placeholder packs identically to an all-zero pixel clip
    of the same grid (the serving /decode path relies on this — it packs
    GridOnly to reserve budget slots without patchifying dummy pixels)."""
    from titok_tpu.data.packing import GridOnly

    vids = [_vid(rng, 8, 16, 16), np.zeros((3, 4, 8, 24), np.float32)]
    tcs = [5, 2]
    ref = pack_samples(vids, tcs, seq_len=64, max_samples=4, patch_size=PATCH)
    got = pack_samples([vids[0], GridOnly((4, 8, 24))], tcs, seq_len=64,
                       max_samples=4, patch_size=PATCH)
    for name in ("patches", "segment_ids", "token_mask", "rope_cos",
                 "rope_sin", "token_counts", "grid_sizes", "grids",
                 "sample_valid"):
        np.testing.assert_array_equal(getattr(got, name), getattr(ref, name),
                                      err_msg=name)
    # channel inference also works when GridOnly leads the batch
    first = pack_samples([GridOnly((4, 8, 24)), vids[0]], [2, 5], seq_len=64,
                         max_samples=4, patch_size=PATCH)
    assert first.patches.shape == ref.patches.shape
