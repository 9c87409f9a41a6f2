"""V-JEPA JAX port golden tests (same methodology as the I3D /
InceptionV3 ports: no jepa weights exist on this image, so the port +
converter are validated against a random-weight torch mirror implementing
the identical spec; the bicubic preprocessing is validated against real
torch ``F.interpolate``). Reference: ``model/metrics/jedi.py:78-141``."""

import numpy as np
import pytest
import torch

from tests.torch_vjepa_mirror import TorchVJEPAFeatures
from titok_tpu.metrics.jedi import JEDiMetric
from titok_tpu.metrics.vjepa import (SPECS, JaxVJEPAExtractor,
                                     VJEPAFeatures, load_vjepa_params,
                                     preprocess_bcthw,
                                     resize_short_side_bicubic)
from tools.convert_vjepa import convert_mirror_state_dict

SPEC = SPECS["test_tiny"]


def _unflatten(flat):
    import jax.numpy as jnp

    tree = {}
    for key, val in flat.items():
        node = tree
        for p in key.split("/")[:-1]:
            node = node.setdefault(p, {})
        node[key.split("/")[-1]] = jnp.asarray(val)
    return tree


@pytest.fixture(scope="module")
def mirror():
    torch.manual_seed(7)
    m = TorchVJEPAFeatures(SPEC)
    with torch.no_grad():
        for p in m.parameters():
            p.normal_(0, 0.05)
    return m.eval()


@pytest.fixture(scope="module")
def jax_params(mirror):
    flat = convert_mirror_state_dict(
        {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    )
    return _unflatten(flat)


@pytest.mark.parametrize("shape", [(48, 64), (224, 160), (100, 100)])
def test_bicubic_resize_matches_torch(rng, shape):
    """The short-side bicubic resize must match torchvision's
    ``Resize(size, antialias=False)`` = F.interpolate bicubic
    (reference preprocessing, jedi.py:103)."""
    h, w = shape
    x = rng.uniform(0, 1, size=(3, 2, h, w)).astype(np.float32)
    target = 56
    ours = resize_short_side_bicubic(x, target)
    if h <= w:
        size = (target, max(1, int(round(w * target / h))))
    else:
        size = (max(1, int(round(h * target / w))), target)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=size, mode="bicubic",
        align_corners=False, antialias=False,
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_vjepa_golden_vs_torch_mirror(mirror, jax_params, rng):
    """Native-grid forward: converter + flax modules == torch mirror."""
    s = SPEC
    x = rng.normal(size=(2, s.frames_per_clip, s.crop_size, s.crop_size,
                         3)).astype(np.float32)
    ours = VJEPAFeatures(s).apply({"params": jax_params}, x)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_vjepa_pos_interp_golden(mirror, jax_params, rng):
    """Off-grid input (more frames, non-square) exercises the trilinear
    pos-embed interpolation on both sides (jepa interpolate_pos_encoding
    semantics)."""
    s = SPEC
    x = rng.normal(size=(1, 2 * s.frames_per_clip, s.crop_size,
                         2 * s.crop_size, 3)).astype(np.float32)
    ours = VJEPAFeatures(s).apply({"params": jax_params}, x)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_extractor_and_jedi_end_to_end(jax_params, rng, tmp_path,
                                       monkeypatch):
    """npz round-trip -> JaxVJEPAExtractor -> JEDiMetric: odd-sized
    [-1,1] clips are resized/normalized/frame-padded and produce a
    finite MMD; identical inputs give ~0."""
    flat = convert_mirror_state_dict(
        {k: v.detach().numpy()
         for k, v in TorchVJEPAFeatures(SPEC).state_dict().items()}
    )
    path = str(tmp_path / "vjepa.npz")
    np.savez(path, **flat)
    monkeypatch.setitem(SPECS, "vit_large", SPEC)  # spec under test
    m = JEDiMetric(vjepa_params_path=path)
    a = rng.uniform(-1, 1, size=(3, 3, 2, 40, 56)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(3, 3, 2, 40, 56)).astype(np.float32)
    m.update(a, b)
    assert isinstance(m.feature_fn, JaxVJEPAExtractor)
    val = m.compute()
    assert np.isfinite(val)
    m.reset()
    m.update(a, a)
    assert m.compute() == pytest.approx(0.0, abs=1e-6)


def test_preprocess_matches_reference_semantics(rng):
    """[-1,1] -> [0,1] -> resize -> ImageNet-normalize -> repeat-pad to
    frames_per_clip (reference get_feats, jedi.py:131-141)."""
    s = SPEC
    v = rng.uniform(-1, 1, size=(1, 3, 2, s.crop_size,
                                 s.crop_size)).astype(np.float32)
    out = preprocess_bcthw(v, s)
    assert out.shape == (1, s.frames_per_clip, s.crop_size, s.crop_size, 3)
    # padded frames repeat the last real frame
    np.testing.assert_array_equal(out[0, 1], out[0, -1])
    # the no-resize path is exactly normalize((v+1)/2)
    from titok_tpu.metrics.vjepa import IMAGENET_MEAN, IMAGENET_STD

    want = ((v[0, :, 0].astype(np.float32) + 1) / 2
            - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    np.testing.assert_allclose(out[0, 0].transpose(2, 0, 1), want,
                               atol=1e-6)
