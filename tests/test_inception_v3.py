"""JAX InceptionV3 port + converter golden tests: a random-weight torch
mirror of torchvision's ``inception_v3`` (state-dict-key compatible;
torchvision itself is not installed here), run through the reference's
sliced forward (upsample-299 + stem + Mixed blocks + avgpool + fc,
reference ``model/metrics/metrics.py:206-231``), must agree with the flax
port under weight conversion; and the extractor must drive FID/IS/MMD
end-to-end through MetricCalculator."""

import numpy as np
import pytest
import torch

from tests.torch_inception_mirror import TorchInceptionV3
from titok_tpu.metrics.image_metrics import MetricCalculator
from titok_tpu.metrics.inception_v3 import (
    InceptionV3,
    JaxInceptionExtractor,
    resize_bilinear_align_corners,
)
from tools.convert_inception import convert_state_dict


def _unflatten(flat):
    import jax.numpy as jnp

    tree = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def _torch_sliced_forward(m, x, resize=True):
    """The reference's InceptionV3.forward (metrics.py:206-231)."""
    if resize:
        x = torch.nn.Upsample(size=(299, 299), mode="bilinear",
                              align_corners=True)(x)
    return m(x)


@pytest.fixture(scope="module")
def torch_inception():
    torch.manual_seed(0)
    m = TorchInceptionV3()
    # randomize BN running stats so folding is actually exercised
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)
    return m.eval()


def test_converter_counts(torch_inception):
    flat = convert_state_dict(
        {k: v.detach().numpy() for k, v in torch_inception.state_dict().items()}
    )
    assert sum(1 for k in flat if k.endswith("conv/kernel")) == 94
    assert "fc/kernel" in flat and "fc/bias" in flat
    assert not any(k.startswith("AuxLogits") for k in flat)


def test_resize_matches_torch_upsample(rng):
    x = rng.uniform(-1, 1, size=(2, 3, 17, 23)).astype(np.float32)
    expected = torch.nn.Upsample(size=(64, 48), mode="bilinear",
                                 align_corners=True)(
        torch.from_numpy(x)).numpy()
    got = np.asarray(resize_bilinear_align_corners(
        np.transpose(x, (0, 2, 3, 1)), 64, 48))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), expected,
                               atol=1e-5, rtol=1e-5)


def test_inception_golden_vs_torchvision(torch_inception, rng):
    flat = convert_state_dict(
        {k: v.detach().numpy() for k, v in torch_inception.state_dict().items()}
    )
    params = _unflatten(flat)
    model = InceptionV3()

    x = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        exp_acts, exp_logits = _torch_sliced_forward(
            torch_inception, torch.from_numpy(x))

    acts, logits = model.apply(
        {"params": params}, np.transpose(x, (0, 2, 3, 1)))
    acts, logits = np.asarray(acts), np.asarray(logits)
    assert acts.shape == (2, 2048) and logits.shape == (2, 1000)
    np.testing.assert_allclose(acts, exp_acts.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(logits, exp_logits.numpy(), atol=2e-3,
                               rtol=1e-3)


def test_extractor_drives_fid_is_mmd(torch_inception, rng):
    flat = convert_state_dict(
        {k: v.detach().numpy() for k, v in torch_inception.state_dict().items()}
    )
    ex = JaxInceptionExtractor(_unflatten(flat))
    calc = MetricCalculator(metrics=("fid", "is", "mmd", "psnr"),
                            feature_fn=ex)
    target = rng.uniform(-1, 1, size=(4, 3, 32, 32)).astype(np.float32)
    recon = np.clip(target + rng.normal(0, 0.1, target.shape), -1, 1).astype(
        np.float32)
    calc.update(recon, target)
    out = calc.compute()
    assert np.isfinite(out["fid"]) and out["fid"] >= 0
    assert np.isfinite(out["mmd"])
    assert out["is"] >= 1.0  # IS = exp(mean KL) >= 1
    # identical distributions -> FID ~ 0
    calc.reset()
    calc.update(target, target)
    same = calc.compute()
    assert same["fid"] < 1e-3
