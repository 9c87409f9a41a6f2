"""FSQ unit + golden parity tests vs the PyTorch reference implementation.

The reference quantizer (reference ``model/quantizer/fsq.py``) is pure
torch/einops and importable on CPU, so parity is checked against the real
thing, not a transcription.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, has_reference
from titok_tpu.models.quantizer import FSQ

LEVELS = [7, 5, 5, 5, 5]


@pytest.fixture(scope="module")
def ref_fsq():
    if not has_reference():
        pytest.skip("reference not available")
    sys.path.insert(0, REFERENCE)
    from model.quantizer.fsq import FSQ as RefFSQ

    return RefFSQ(LEVELS)


def test_codebook_size():
    f = FSQ(LEVELS)
    assert f.codebook_size == 7 * 5 * 5 * 5 * 5 == 4375


def test_roundtrip_all_codes():
    """codes_to_indices ∘ indices_to_codes == id over the whole codebook."""
    f = FSQ(LEVELS)
    idx = np.arange(f.codebook_size, dtype=np.int32)
    codes = f.indices_to_codes(idx)
    back = np.asarray(f.codes_to_indices(codes))
    np.testing.assert_array_equal(back, idx)


def test_implicit_codebook_matches_reference(ref_fsq):
    ours = FSQ(LEVELS).implicit_codebook()
    theirs = ref_fsq.implicit_codebook.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)


def test_quantize_matches_reference(ref_fsq, rng):
    import torch

    z = rng.normal(size=(512, len(LEVELS))).astype(np.float32) * 2.0
    ours_codes, ours_dict = FSQ(LEVELS)(z)
    with torch.no_grad():
        ref_codes, ref_dict = ref_fsq(torch.from_numpy(z))
    np.testing.assert_allclose(
        np.asarray(ours_codes), ref_codes.numpy(), rtol=0, atol=2e-6
    )
    np.testing.assert_array_equal(
        np.asarray(ours_dict["indices"]), ref_dict["indices"].numpy()
    )


def test_indices_match_reference_on_grid(ref_fsq):
    """Token-ID parity on a dense sweep of latent space (north-star metric)."""
    import torch

    grid = np.stack(
        np.meshgrid(*[np.linspace(-3, 3, 9)] * 2, indexing="ij"), axis=-1
    ).reshape(-1, 2)
    z = np.concatenate(
        [grid, np.tile(grid[:, :1], (1, len(LEVELS) - 2))], axis=1
    ).astype(np.float32)
    ours = np.asarray(FSQ(LEVELS)(z)[1]["indices"])
    with torch.no_grad():
        theirs = ref_fsq(torch.from_numpy(z))[1]["indices"].numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_straight_through_gradient():
    import jax
    import jax.numpy as jnp

    f = FSQ(LEVELS)

    def loss(z):
        codes, _ = f(z)
        return jnp.sum(codes**2)

    z = jnp.asarray(np.random.default_rng(1).normal(size=(8, len(LEVELS))), jnp.float32)
    g = jax.grad(loss)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # STE passes gradient through round
