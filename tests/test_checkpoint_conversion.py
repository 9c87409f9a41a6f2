"""Torch<->flax checkpoint conversion roundtrip + forward equivalence."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.util import synthetic_videos
from titok_tpu.models.titok import TiTok, TiTokModel
from tools.convert_checkpoint import flax_to_torch_sd, torch_sd_to_flax

PATCH = (2, 4, 4)


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                atol=1e-7, err_msg=path + "/" + k,
            )


def test_roundtrip_param_tree(rng):
    model = TiTokModel(
        TiTok(patch_size=PATCH, dtype=jnp.float32, attn_impl="reference"),
        seq_len=128, min_grid=(2, 8, 8),
    )
    sd = flax_to_torch_sd(model.params, prefix="model.")
    # looks like a reference checkpoint
    assert "model.encoder.proj_in.weight" in sd
    assert "model.encoder.model_layers.attn_layer.0.to_qkv.weight" in sd
    assert "model.encoder.model_layers.attn_post_ln.0.weight" in sd
    assert "model.encoder.mask_token" in sd
    # linear weights are torch-layout [out, in]
    w = sd["model.encoder.proj_in.weight"]
    assert w.shape == (256, np.prod(PATCH) * 3)

    back = torch_sd_to_flax({k: torch.from_numpy(v) for k, v in sd.items()},
                            prefix="model.")
    _tree_equal(model.params, back)


def test_converted_checkpoint_runs(rng):
    """Params loaded from a 'reference checkpoint' produce identical outputs."""
    m1 = TiTokModel(
        TiTok(patch_size=PATCH, dtype=jnp.float32, attn_impl="reference"),
        seq_len=128, min_grid=(2, 8, 8), seed=0,
    )
    sd = {k: torch.from_numpy(v)
          for k, v in flax_to_torch_sd(m1.params, "model.").items()}
    params2 = torch_sd_to_flax(sd, "model.")
    params2 = jax.tree_util.tree_map(jnp.asarray, params2)
    m2 = TiTokModel(m1.module, params=params2, seq_len=128, min_grid=(2, 8, 8))

    v = synthetic_videos(rng, 1, PATCH)
    i1 = m1.encode(v, [4])[0]
    i2 = m2.encode(v, [4])[0]
    np.testing.assert_array_equal(i1, i2)
