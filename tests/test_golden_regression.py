"""Golden regression trace: the seeded tiny model must keep producing the
recorded token IDs (bit-exact) and reconstructions (tolerance) across
refactors. Unlike the reference-parity tests, this works without
/root/reference or torch — it guards against silent semantic drift in
future rounds.

Regenerate (only after an intentional semantic change):
    python -c "see tests/golden/README or git log for the recording snippet"
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from titok_tpu.models.titok import TiTok, TiTokModel

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "titok_tiny_trace.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no golden trace")
def test_golden_trace():
    data = np.load(GOLDEN)
    model = TiTokModel(
        TiTok(patch_size=(2, 4, 4), dtype=jnp.float32, attn_impl="reference"),
        seq_len=256, min_grid=(2, 8, 8), seed=7,
    )
    vids = [data["vid0"], data["vid1"]]
    recon, aux = model.forward(vids, [5, 9])
    np.testing.assert_array_equal(aux["indices"][0], data["idx0"])
    np.testing.assert_array_equal(aux["indices"][1], data["idx1"])
    np.testing.assert_allclose(recon[0], data["recon0"], atol=1e-5)
    np.testing.assert_allclose(recon[1], data["recon1"], atol=1e-5)
