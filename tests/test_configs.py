"""Shipped configs parse and construct the full system (schema drift guard)."""

import glob
import os

import pytest

from titok_tpu.config import load_config
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.models.blocks import get_model_dims
from titok_tpu.models.titok import _config_max_seg_len, make_titok

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                        "configs", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_constructs_system(path):
    cfg = load_config(path)
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    assert model.token_size >= 1
    assert model.codebook_size > 1
    # seq budget sanity (the reference asserts this in the packer,
    # video_dataset.py:144-146)
    assert _config_max_seg_len(cfg) <= int(cfg.training.sampling.train_seq_len)
    # numeric overrides parsed as numbers, not strings
    assert isinstance(cfg.optimizer.learning_rate, float)
    assert isinstance(cfg.training.main.max_steps, int)
    if "vq" in os.path.basename(path):
        assert model.quantizer == "vq"
        assert ls.use_disc


def test_all_model_sizes_have_dims():
    for size in ("tiny", "small", "base", "large"):
        width, layers, heads, mlp = get_model_dims(size)
        assert width == 64 * heads[0]
        assert layers >= 4 and heads[0] % heads[1] == 0


def test_small_model_forward(rng):
    """Non-tiny size smoke: 'small' (8L/512w) forwards on a packed batch."""
    import jax
    import jax.numpy as jnp

    from tests.util import synthetic_videos
    from titok_tpu.data.packing import pack_samples
    from titok_tpu.models.titok import TiTok

    model = TiTok(patch_size=(2, 4, 4), encoder_size="small",
                  decoder_size="small", dtype=jnp.float32,
                  attn_impl="reference")
    vids = synthetic_videos(rng, 1)
    batch = pack_samples(vids, [3], seq_len=64, max_samples=2,
                         patch_size=(2, 4, 4))
    arrs = batch.device_arrays()
    params = model.init(jax.random.PRNGKey(0), arrs)["params"]
    recon, aux = model.apply({"params": params}, arrs)
    assert recon.shape == (64, 2 * 4 * 4 * 3)
    import numpy as np

    assert np.isfinite(np.asarray(recon, np.float32)).all()
