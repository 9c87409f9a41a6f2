"""RoPE parity vs the PyTorch reference (reference ``model/base/rope.py``).

The reference RoPE module is torch/einops-only and importable; we check the
full pipeline: position-id layout, frequency schedule, and rotation
application on a packed multi-sample sequence.
"""

import sys

import numpy as np
import pytest
import torch

from tests.conftest import REFERENCE, has_reference
from titok_tpu.models.rope import (
    apply_rotary_emb,
    positions_for_sample,
    rope_cos_sin,
)

HEAD_DIM = 64
GRID_DIMS = 3


@pytest.fixture(scope="module")
def ref_rope():
    if not has_reference():
        pytest.skip("reference not available")
    sys.path.insert(0, REFERENCE)
    from model.base.rope import RoPE

    return RoPE(head_dim=HEAD_DIM, grid_dims=GRID_DIMS)


def _packed_positions(grids, token_counts):
    return np.concatenate(
        [positions_for_sample(g, tc) for g, tc in zip(grids, token_counts)], axis=0
    )


def test_freqs_cis_matches_reference(ref_rope):
    grids = [(2, 3, 4), (1, 2, 2)]
    token_counts = [5, 1]
    with torch.no_grad():
        ref_cis = ref_rope(
            torch.tensor(grids, dtype=torch.int32),
            torch.tensor(token_counts, dtype=torch.int32),
            torch.device("cpu"),
        ).numpy()
    ids = _packed_positions(grids, token_counts)
    cos, sin = rope_cos_sin(ids, HEAD_DIM, GRID_DIMS)
    np.testing.assert_allclose(cos, ref_cis.real.astype(np.float32), atol=1e-6)
    np.testing.assert_allclose(sin, ref_cis.imag.astype(np.float32), atol=1e-6)


def test_apply_rotary_matches_reference(ref_rope, rng):
    sys.path.insert(0, REFERENCE)
    from model.base.rope import apply_rotary_emb as ref_apply

    grids = [(2, 2, 2), (1, 4, 2)]
    token_counts = [3, 7]
    ids = _packed_positions(grids, token_counts)
    L = ids.shape[0]
    H = 4
    x = rng.normal(size=(L, H, HEAD_DIM)).astype(np.float32)

    with torch.no_grad():
        ref_cis = ref_rope(
            torch.tensor(grids, dtype=torch.int32),
            torch.tensor(token_counts, dtype=torch.int32),
            torch.device("cpu"),
        )
        # ref_apply mutates its input in place (view_as_complex of a view);
        # pass a copy so our input stays pristine
        ref_out = ref_apply(torch.from_numpy(x.copy()), ref_cis).numpy()

    cos, sin = rope_cos_sin(ids, HEAD_DIM, GRID_DIMS)
    ours = np.asarray(apply_rotary_emb(x, cos, sin))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5)


def test_passthrough_dims():
    """head_dim 64 with 3 axes rotates 60 dims; the last 4 pass through."""
    ids = positions_for_sample((2, 2, 2), 2)
    cos, sin = rope_cos_sin(ids, HEAD_DIM, GRID_DIMS)
    assert cos.shape[1] == 30  # 10 freqs * 3 axes = 30 complex pairs
    x = np.random.default_rng(0).normal(size=(ids.shape[0], 2, HEAD_DIM)).astype(np.float32)
    out = np.asarray(apply_rotary_emb(x, cos, sin))
    np.testing.assert_array_equal(out[..., 60:], x[..., 60:])


def test_position_layout():
    """Token i at (i,i,i); patch (t,h,w) at (t,h,w)+tc (ref rope.py:57-67)."""
    pos = positions_for_sample((2, 1, 3), 4)
    assert pos.shape == (4 + 6, 3)
    np.testing.assert_array_equal(pos[:4], np.arange(4)[:, None].repeat(3, 1))
    np.testing.assert_array_equal(pos[4], [4, 4, 4])   # (0,0,0)+4
    np.testing.assert_array_equal(pos[5], [4, 4, 5])   # (0,0,1)+4
    np.testing.assert_array_equal(pos[7], [5, 4, 4])   # (1,0,0)+4
