"""tools/flops.py: the analytic param model must match real flax params."""

import jax
import jax.numpy as jnp
import numpy as np

from titok_tpu.models.blocks import PackedEncoder
from titok_tpu.models.rope import rope_cos_sin
from tools.flops import StackDims, proj_fwd_flops, stack_params, train_step_flops


def _matmul_param_count(params) -> int:
    """Count elements of 2D+ kernels only (the FLOPs-bearing weights)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if leaf.ndim >= 2 and leaf.size > 1:
            total += leaf.size
    return total


def test_stack_params_matches_flax():
    enc = PackedEncoder(model_size="tiny", out_channels=5)
    S = 64
    patches = jnp.zeros((S, 3 * 4 * 8 * 8), jnp.float32)
    token_mask = jnp.zeros((S,), bool)
    seg = jnp.zeros((S,), jnp.int32)
    ids = np.zeros((S, 3), np.float32)
    cos, sin = rope_cos_sin(ids, head_dim=64, grid_dims=3)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    params = enc.init(jax.random.PRNGKey(0), patches, token_mask, seg,
                      cos, sin)["params"]

    d = StackDims.from_size("tiny")
    patch_dim = 3 * 4 * 8 * 8
    expected = stack_params(d) + d.width * (patch_dim + 5)
    assert _matmul_param_count(params) == expected


def test_train_step_flops_monotone_and_positive():
    tiny = train_step_flops("tiny", "tiny", 6144)
    base = train_step_flops("base", "base", 6144)
    assert 0 < tiny.total < base.total
    no_gan = train_step_flops("base", "base", 6144, use_gan=False)
    assert no_gan.disc_fwd == 0 and no_gan.total < base.total
    # backward is exactly 2x forward for the generator
    np.testing.assert_allclose(tiny.gen_bwd, 2.0 * tiny.gen_fwd)


def test_proj_flops_formula():
    # 2 * S * width * (patch_dim + out): one in-proj + one out-proj matmul
    assert proj_fwd_flops(256, 768, 5, 100) == 2.0 * 100 * 256 * 773


def test_train_step_mem_matches_measured_oom_points():
    """The HBM model must reproduce the two points measured on the relay
    (2026-08-19): all-large @ seq 6144 OOMs a 15.75 GB v5e (compiler
    reported 19.6 GB used); large tokenizer + base disc compiles and
    trains."""
    from tools.flops import V5E_HBM_BYTES, train_step_mem

    all_large = train_step_mem("large", "large", 6144)
    assert all_large.total * 1.1 > V5E_HBM_BYTES
    # the model is an underestimate of the 19.6 GB measurement, but must
    # land within ~20% of it
    assert abs(all_large.total * 1.1 - 19.6 * 1024**3) < 0.2 * 19.6 * 1024**3

    fits = train_step_mem("large", "base", 6144)
    assert fits.total * 1.1 <= V5E_HBM_BYTES
    assert fits.total < all_large.total

    no_gan = train_step_mem("large", "base", 6144, use_gan=False)
    assert no_gan.total < fits.total
