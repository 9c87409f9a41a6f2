"""North-star golden parity: full TiTok forward vs a torch mirror of the
reference semantics, sharing weights. Token IDs must match bit-exactly;
reconstructions within numerical tolerance (BASELINE.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import has_reference
from tests.util import synthetic_videos
from titok_tpu.models.titok import TiTok, TiTokModel

PATCH = (2, 4, 4)
LEVELS = (7, 5, 5, 5, 5)


@pytest.fixture(scope="module")
def model():
    mod = TiTok(patch_size=PATCH, fsq_levels=LEVELS, dtype=jnp.float32,
                attn_impl="reference")
    return TiTokModel(mod, seq_len=256, min_grid=(2, 8, 8))


@pytest.mark.skipif(not has_reference(), reason="reference not available")
def test_full_forward_parity(model, rng):
    from tests.torch_mirror import titok_forward

    videos = synthetic_videos(rng, 3, PATCH)
    token_counts = [5, 2, 7]

    ours_recon, ours_aux = model.forward(videos, token_counts)
    ours_indices = ours_aux["indices"]

    model_dims = (256, 4, (4, 2))  # tiny
    ref_recon, ref_indices_flat = titok_forward(
        model.params, videos, token_counts, PATCH, LEVELS, model_dims
    )

    # token IDs: bit-exact (north-star metric)
    ref_idx = np.asarray(ref_indices_flat)
    off = 0
    for b, tc in enumerate(token_counts):
        np.testing.assert_array_equal(
            ours_indices[b], ref_idx[off : off + tc],
            err_msg=f"token IDs diverge for sample {b}",
        )
        off += tc

    # reconstructions: numerical tolerance (fp32 both sides)
    for b in range(len(videos)):
        ref_v = ref_recon[b].numpy()
        np.testing.assert_allclose(
            ours_recon[b], ref_v, atol=5e-4, rtol=1e-3,
            err_msg=f"recon diverges for sample {b}",
        )


@pytest.mark.skipif(not has_reference(), reason="reference not available")
def test_encoder_latents_parity(model, rng):
    """Pre-quantizer latents agree closely (tighter layer-level check)."""
    import jax

    from tests.torch_mirror import encoder_forward

    videos = synthetic_videos(rng, 2, PATCH)
    token_counts = [4, 3]

    batch = model._pack(videos, token_counts)
    arrs = batch.device_arrays()
    z, _ = model.module.apply(
        {"params": model.params}, arrs, method=model.module.encode_packed
    )
    # ours: [S, token_size] valid at token slots
    from titok_tpu.data.packing import sample_offsets

    offs = sample_offsets(batch.token_counts, batch.grid_sizes)
    # dequantized codes are discrete; compare the raw encoder output instead
    from titok_tpu.models.blocks import PackedEncoder

    encoder = PackedEncoder(
        model_size="tiny", patch_size=PATCH, out_channels=len(LEVELS),
        dtype=jnp.float32, attn_impl="reference",
    )
    enc_raw = encoder.apply(
        {"params": model.params["encoder"]},
        arrs["patches"], arrs["token_mask"], arrs["segment_ids"],
        arrs["rope_cos"], arrs["rope_sin"],
    )
    ref_tokens = encoder_forward(
        model.params["encoder"], videos, token_counts, PATCH, (256, 4, (4, 2))
    ).numpy()

    ours_tok = []
    for b, tc in enumerate(token_counts):
        ours_tok.append(np.asarray(enc_raw[offs[b] : offs[b] + tc]))
    ours_tok = np.concatenate(ours_tok, 0)
    np.testing.assert_allclose(ours_tok, ref_tokens, atol=2e-4, rtol=1e-3)
