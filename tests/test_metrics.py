"""Metric math tests: PSNR/SSIM known values, Fréchet/MMD/IS properties,
EvalMetrics hub with a fake video feature extractor."""

import numpy as np
import pytest

from tests.util import tiny_config
from titok_tpu.metrics.eval_metrics import EvalMetrics
from titok_tpu.metrics.fvd import FVDCalculator, compute_stats, frechet_distance
from titok_tpu.metrics.image_metrics import MetricCalculator, inception_score
from titok_tpu.metrics.jedi import JEDiMetric, mmd_poly
from titok_tpu.metrics.psnr_ssim import PSNRMetric, SSIMMetric, ssim_image


def test_psnr_known_value():
    m = PSNRMetric(data_range=2.0)
    a = np.zeros((1, 3, 8, 8))
    b = np.full((1, 3, 8, 8), 0.2)
    m.update(a, b)
    # mse = 0.04 -> 10*log10(4/0.04) = 20
    np.testing.assert_allclose(m.compute(), 20.0, atol=1e-6)


def test_psnr_global_accumulation():
    """torchmetrics semantics: one global MSE over all updates, not a mean
    of per-batch PSNRs."""
    m = PSNRMetric(2.0)
    m.update(np.zeros((4,)), np.full((4,), 0.1))
    m.update(np.zeros((4,)), np.full((4,), 0.3))
    mse = (4 * 0.01 + 4 * 0.09) / 8
    np.testing.assert_allclose(m.compute(), 10 * np.log10(4 / mse), atol=1e-6)


def test_ssim_identity_and_range(rng):
    x = rng.uniform(-1, 1, size=(3, 32, 32))
    assert ssim_image(x, x) == pytest.approx(1.0)
    y = rng.uniform(-1, 1, size=(3, 32, 32))
    s = ssim_image(x, y)
    assert -1.0 <= s < 0.9


def test_frechet_distance_properties(rng):
    a = rng.normal(size=(500, 16))
    np.testing.assert_allclose(
        frechet_distance(*compute_stats(a), *compute_stats(a)), 0.0, atol=1e-6
    )
    b = rng.normal(loc=3.0, size=(500, 16))
    d = frechet_distance(*compute_stats(a), *compute_stats(b))
    assert d > 100  # |mu diff|^2 = 16*9 = 144 dominated


def test_mmd_poly_properties(rng):
    a = rng.normal(size=(100, 8))
    assert mmd_poly(a, a) == pytest.approx(0.0, abs=1e-6)
    b = rng.normal(loc=2.0, size=(100, 8))
    assert mmd_poly(a, b) > 0


def test_inception_score_bounds(rng):
    # uniform logits -> IS 1; peaked + diverse -> IS ~ num_classes
    assert inception_score(np.zeros((50, 10))) == pytest.approx(1.0, abs=1e-5)
    peaked = np.eye(10)[np.arange(50) % 10] * 50
    assert inception_score(peaked) == pytest.approx(10.0, rel=0.01)


class _FakeExtractor:
    """Deterministic video 'features': per-channel means and stds."""

    def __call__(self, v_bcthw):
        v = np.asarray(v_bcthw, np.float64)
        flat = v.reshape(v.shape[0], v.shape[1], -1)
        return np.concatenate([flat.mean(-1), flat.std(-1)], axis=1)


def test_fvd_calculator_with_fake_extractor(rng):
    calc = FVDCalculator()
    calc._extractor = _FakeExtractor()
    for _ in range(4):
        t = rng.normal(size=(8, 3, 4, 16, 16))
        calc.update(t + 0.01 * rng.normal(size=t.shape), t)
    d_close = calc.compute()
    calc.reset()
    for _ in range(4):
        t = rng.normal(size=(8, 3, 4, 16, 16))
        calc.update(t + 2.0, t)
    assert calc.compute() > d_close


def test_jedi_requires_extractor():
    m = JEDiMetric()
    with pytest.raises(RuntimeError, match="V-JEPA"):
        m.update(np.zeros((1, 3, 4, 8, 8)), np.zeros((1, 3, 4, 8, 8)))


def test_eval_metrics_hub(rng):
    cfg = tiny_config()
    em = EvalMetrics(cfg)
    clips = [rng.uniform(-1, 1, size=(3, 4, 16, 16)).astype(np.float32)
             for _ in range(3)]
    em.update([c + 0.05 for c in clips], clips)
    out = em.compute()
    assert set(out) == {"eval/psnr", "eval/ssim"}
    assert out["eval/psnr"] > 20
    em.reset()
    assert np.isnan(em.compute()["eval/psnr"])


def test_image_metric_calculator(rng):
    mc = MetricCalculator(metrics=("psnr", "ssim"))
    a = rng.uniform(-1, 1, size=(2, 3, 16, 16)).astype(np.float32)
    mc.update(a + 0.1, a)
    out = mc.compute()
    assert "psnr" in out and "ssim" in out


def test_device_psnr_matches_host(rng):
    """Packed device-side PSNR stats == host PSNR over unpacked clips."""
    import jax

    from titok_tpu.data.packing import pack_samples, unpack_videos
    from titok_tpu.metrics.psnr_device import packed_psnr_stats, psnr_from_stats

    vids = [rng.uniform(-1, 1, size=(3, 4, 8, 8)).astype(np.float32)
            for _ in range(2)]
    batch = pack_samples(vids, [2, 3], seq_len=64, max_samples=4,
                         patch_size=(2, 4, 4))
    recon_rows = batch.patches.astype(np.float32) + rng.normal(
        scale=0.1, size=batch.patches.shape).astype(np.float32)

    sse, cnt = jax.jit(packed_psnr_stats)(recon_rows, batch.device_arrays())
    dev = psnr_from_stats(float(sse), float(cnt))

    host = PSNRMetric(2.0)
    recons = unpack_videos(np.clip(recon_rows, -1, 1), batch, (2, 4, 4))
    for r, t in zip(recons, vids):
        host.update(r, t)
    np.testing.assert_allclose(dev, host.compute(), rtol=1e-5)


def test_jedi_e2e_in_validate(tmp_path):
    """eval/jedi flows through the full validate() path with a local
    torchscript extractor (the staged-artifact mechanism for V-JEPA)."""
    import json
    import os

    import torch

    from tests.util import tiny_config
    from titok_tpu.training.trainer import Trainer

    class TinyEmbed(torch.nn.Module):
        def forward(self, x):  # [B, C, T, H, W] -> [B, 8]
            m = x.mean(dim=(2, 3, 4))          # [B, C]
            s = x.std(dim=(2, 3, 4))
            mx = x.amax(dim=(2, 3, 4))
            return torch.cat([m, s, mx[:, :2]], dim=1)

    ts = torch.jit.script(TinyEmbed())
    path = str(tmp_path / "jedi_embed.pt")
    ts.save(path)

    cfg = tiny_config(**{
        "dataset.train_dataset": "synthetic",
        "dataset.eval_dataset": "synthetic",
        "training.eval.eval_samples": 4,
        "training.eval.log_metrics": ["jedi"],
        "training.eval.log_recon_num": 0,
        "training.eval.jedi_extractor_path": path,
    })
    cfg.set_dotted("general.checkpoints.save_path", str(tmp_path / "out"))
    trainer = Trainer(cfg)
    state = trainer._init_state(0)
    trainer.validate(state, 0)

    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path / "out"), "metrics.jsonl"))]
    merged = {}
    for l in lines:
        merged.update(l)
    assert "eval/jedi" in merged
    assert np.isfinite(merged["eval/jedi"])
