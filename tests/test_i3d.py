"""JAX InceptionI3d port + converter golden tests: a random-weight torch
mirror (pytorch-i3d structure, the class the reference's torchscript wraps)
converted structurally must agree with the flax model; FVD end-to-end runs
through Trainer.validate and lands eval/fvd in metrics.jsonl."""

import numpy as np
import pytest
import torch

import jax

from tests.torch_i3d_mirror import TorchInceptionI3d
from titok_tpu.metrics.i3d import InceptionI3d, JaxI3DExtractor
from tools.convert_i3d import convert_state_dict, flax_conv_paths


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


@pytest.fixture(scope="module")
def torch_i3d():
    torch.manual_seed(0)
    m = TorchInceptionI3d(num_classes=400)
    # randomize BN running stats so folding is actually exercised
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm3d):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)
    return m.eval()


def test_converter_structural_match(torch_i3d):
    flat = convert_state_dict(
        {k: v.detach().numpy() for k, v in torch_i3d.state_dict().items()}
    )
    # every expected flax conv present, logits has a bias, others have BN
    for path in flax_conv_paths():
        assert f"{path}/conv/kernel" in flat
        if path == "logits":
            assert f"{path}/conv/bias" in flat
        else:
            assert f"{path}/bn_scale" in flat


def test_i3d_golden_vs_torch_mirror(torch_i3d, rng):
    flat = convert_state_dict(
        {k: v.detach().numpy() for k, v in torch_i3d.state_dict().items()}
    )
    params = _unflatten(flat)
    model = InceptionI3d(num_classes=400)

    x = rng.uniform(-1, 1, size=(2, 3, 12, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expected = torch_i3d(torch.from_numpy(x)).numpy()

    got = np.asarray(model.apply(
        {"params": params},
        np.transpose(x, (0, 2, 3, 4, 1)),  # NCTHW -> NDHWC
    ))
    assert got.shape == expected.shape == (2, 400)
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


def test_jax_extractor_preprocess(torch_i3d, rng):
    """Short clips get last-frame-repeated to 10 frames; resize runs."""
    flat = convert_state_dict(
        {k: v.detach().numpy() for k, v in torch_i3d.state_dict().items()}
    )
    ex = JaxI3DExtractor(_unflatten(flat), target=64)
    feats = ex(rng.uniform(-1, 1, size=(2, 3, 4, 32, 40)).astype(np.float32))
    assert feats.shape == (2, 400)
    assert np.isfinite(feats).all()


def test_fvd_e2e_in_validate(tmp_path, rng):
    """eval/fvd appears in metrics.jsonl via the full validate() path
    (VERDICT r1 next #6), using converted random-init I3D weights."""
    from tests.util import tiny_config
    from titok_tpu.training.trainer import Trainer

    torch.manual_seed(1)
    m = TorchInceptionI3d(num_classes=400).eval()
    flat = convert_state_dict(
        {k: v.detach().numpy() for k, v in m.state_dict().items()}
    )
    npz = str(tmp_path / "i3d.npz")
    np.savez(npz, **flat)

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "training.eval.eval_samples": 3,
        "training.eval.log_metrics": ["psnr", "fvd"],
        "training.eval.log_recon_num": 0,
        "training.eval.i3d_path": npz,
    })
    cfg.set_dotted("general.checkpoints.save_path", str(tmp_path / "out"))
    # shrink the resize target so CPU eval stays quick
    trainer = Trainer(cfg)
    fvd_metric = trainer.eval_metrics.metrics["fvd"][0]
    state = trainer._init_state(0)

    # monkeypatch target after extractor construction
    ex = fvd_metric._get_extractor()
    ex.target = 64

    trainer.validate(state, 0)
    import json, os

    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path / "out"), "metrics.jsonl"))]
    merged = {}
    for l in lines:
        merged.update(l)
    assert "eval/fvd" in merged
    assert np.isfinite(merged["eval/fvd"])
    assert merged["eval/fvd"] >= 0
