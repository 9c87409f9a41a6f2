"""Loss-formula unit tests with a stubbed discriminator: relativistic GAN,
finite-difference R1/R2, centering (reference loss_module.py:141-214)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import build_disc_batch, pack_samples
from titok_tpu.losses.loss_module import LossSystem, _masked_mean, _per_sample_mean


def test_per_sample_mean_masks_padding():
    vals = jnp.asarray([1.0, 2.0, 3.0, 10.0, 99.0])
    seg = jnp.asarray([1, 1, 2, 2, 0])
    mask = jnp.asarray([True, True, False, True, True])
    out = np.asarray(_per_sample_mean(vals, seg, mask, 3))
    np.testing.assert_allclose(out, [1.5, 10.0])


def test_masked_mean():
    x = jnp.asarray([1.0, 5.0, 100.0])
    m = jnp.asarray([True, True, False])
    assert float(_masked_mean(x, m)) == pytest.approx(3.0)


@pytest.fixture
def stubbed_system(rng, monkeypatch):
    cfg = tiny_config(**{
        "tokenizer.losses.disc_weight": 0.4,
        "discriminator.losses.gp_weight": 0.1,
        "discriminator.losses.gp_noise": 0.1,
        "discriminator.losses.centering_weight": 0.01,
    })
    ls = LossSystem(cfg)
    vids = synthetic_videos(rng, 2)
    batch = pack_samples(vids, [2, 3], seq_len=128, max_samples=2,
                         patch_size=PATCH)
    disc = build_disc_batch(batch, ls.disc_tokens)

    # stub: logits = per-sample mean pixel value of the disc patch rows
    def fake_logits(disc_params, rows_d, d):
        s = rows_d.mean(axis=-1)
        B1 = d["sample_valid"].shape[0] + 1
        return _per_sample_mean(s, d["segment_ids"], d["is_patch"], B1)

    def fake_stacked(disc_params, rows_list, d):
        return jnp.stack([fake_logits(disc_params, r, d) for r in rows_list])

    monkeypatch.setattr(ls, "disc_logits", fake_logits)
    monkeypatch.setattr(ls, "disc_logits_stacked", fake_stacked)
    return ls, batch, disc


def test_stacked_disc_forward_equivalence(rng):
    """One packed disc pass over n copies == n separate passes."""
    import jax

    cfg = tiny_config(**{"tokenizer.losses.disc_weight": 0.4})
    ls = LossSystem(cfg)
    vids = synthetic_videos(rng, 2)
    batch = pack_samples(vids, [2, 3], seq_len=128, max_samples=3,
                         patch_size=PATCH)
    disc = build_disc_batch(batch, ls.disc_tokens)
    darrs = disc.device_arrays()
    params = ls.init_disc_params(jax.random.PRNGKey(0),
                                 batch.device_arrays(), darrs)
    rows = jnp.asarray(batch.patches, jnp.float32)
    r0 = ls._disc_rows(rows, darrs)
    r1 = ls._disc_rows(rows + 0.3, darrs)
    r2 = ls._disc_rows(rows - 0.1, darrs)

    stacked = np.asarray(ls.disc_logits_stacked(params, [r0, r1, r2], darrs))
    singles = np.stack([
        np.asarray(ls.disc_logits(params, r, darrs)) for r in (r0, r1, r2)
    ])
    np.testing.assert_allclose(stacked, singles, atol=2e-4, rtol=1e-4)


def test_generator_gan_term(stubbed_system):
    ls, batch, disc = stubbed_system
    arrs, darrs = batch.device_arrays(), disc.device_arrays()
    target = jnp.asarray(batch.patches, jnp.float32)
    recon = target + 0.5  # fake logits: real + 0.5

    total, d = ls.generator_loss({}, {}, recon, arrs, darrs, None)
    # logits_fake - logits_real = +0.5 per sample
    expected_g = float(jax.nn.softplus(-jnp.asarray(0.5)))
    np.testing.assert_allclose(float(d["gen/g_loss"]), expected_g, rtol=1e-5)
    # total = recon_l1 + w_d * g
    np.testing.assert_allclose(
        float(total), float(d["gen/recon_loss"]) + 0.4 * expected_g, rtol=1e-5
    )


def test_discriminator_terms(stubbed_system):
    ls, batch, disc = stubbed_system
    arrs, darrs = batch.device_arrays(), disc.device_arrays()
    target = jnp.asarray(batch.patches, jnp.float32)
    recon = target + 0.5

    total, d = ls.discriminator_loss({}, recon, arrs, darrs,
                                     jax.random.PRNGKey(0))
    # relativistic: real - fake = -0.5
    np.testing.assert_allclose(
        float(d["disc/d_loss"]), float(jax.nn.softplus(jnp.asarray(0.5))),
        rtol=1e-5,
    )
    # stubbed logits are LINEAR in pixels, so logits(x + noise) - logits(x)
    # equals the same noise mean for real and fake -> r1 == r2
    np.testing.assert_allclose(float(d["disc/r1_penalty"]),
                               float(d["disc/r2_penalty"]), rtol=1e-4)
    # total composition
    gp = (0.1 / 0.1**2) * (float(d["disc/r1_penalty"]) + float(d["disc/r2_penalty"]))
    cent = 0.01 * float(d["disc/centering_loss"])
    np.testing.assert_allclose(
        float(total), float(d["disc/d_loss"]) + gp + cent, rtol=1e-4
    )


def test_config_cli():
    from titok_tpu.config import Config, parse_cli_overrides

    cfg = Config({"a": {"b": 1}, "lst": [1, 2]})
    over = parse_cli_overrides(["a.b=2", "a.c=hello", "lst=[3,4]", "f=1e-4"])
    cfg.merge(over)
    assert cfg.a.b == 2 and cfg.a.c == "hello"
    assert cfg.lst == [3, 4]
    assert cfg.f == pytest.approx(1e-4)
    # dotted get with default
    assert cfg.get_dotted("a.missing", 7) == 7
    # yaml roundtrip
    from titok_tpu.config import Config as C
    import yaml

    assert C(yaml.safe_load(cfg.to_yaml())).a.b == 2


def test_stacked_disc_with_flash_kernel(rng):
    """Regression: the stacked disc pass must keep segment ids sorted or
    the flash kernel's interval compression misses blocks (found as NaN
    grads on TPU with real-pipeline batches)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = tiny_config(**{
        "tokenizer.losses.disc_weight": 0.4,
        "training.main.attn_impl": "flash",
    })
    ls = LossSystem(cfg)
    vids = synthetic_videos(rng, 2)
    batch = pack_samples(vids, [2, 3], seq_len=128, max_samples=16,
                         patch_size=PATCH)
    disc = build_disc_batch(batch, ls.disc_tokens)
    darrs = disc.device_arrays()
    with pltpu.force_tpu_interpret_mode():
        params = ls.init_disc_params(jax.random.PRNGKey(0),
                                     batch.device_arrays(), darrs)
        rows = jnp.asarray(batch.patches, jnp.float32)
        r = [ls._disc_rows(rows + 0.1 * i, darrs) for i in range(4)]
        stacked = np.asarray(ls.disc_logits_stacked(params, r, darrs))
        assert np.isfinite(stacked).all()

        def loss(dp):
            logits = ls.disc_logits_stacked(dp, r, darrs)
            return (logits**2).sum()

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in leaves)

    # values match the reference-attention singles
    cfg2 = tiny_config(**{"tokenizer.losses.disc_weight": 0.4})
    ls2 = LossSystem(cfg2)
    singles = np.stack([
        np.asarray(ls2.disc_logits(params, x, darrs)) for x in r
    ])
    # 4 KEEL layers (alpha=8) compound the kernel's ~2e-5 block-order noise
    np.testing.assert_allclose(stacked, singles, atol=1e-3, rtol=1e-3)
