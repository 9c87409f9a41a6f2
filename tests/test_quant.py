"""Int8 serving quantization (titok_tpu/serving/quant.py).

No reference counterpart (the reference serves the f32 torch module
directly, reference ``model/titok.py:47-74``); thresholds here are
against OUR f32 serving path, which golden-parity tests already tie to
the reference.
"""

import numpy as np
import pytest

from tests.util import tiny_config
from titok_tpu.models.titok import TiTokModel, make_titok
from titok_tpu.serving.quant import (
    dequantize_params,
    quantize_kernel,
    quantize_model,
    quantize_params,
)


@pytest.fixture(scope="module")
def served():
    cfg = tiny_config()
    model = TiTokModel(make_titok(cfg), seq_len=256, min_grid=(4, 16, 16))
    rng = np.random.default_rng(0)
    vids = [rng.random((3, 4, 16, 16), np.float32),
            rng.random((3, 8, 16, 16), np.float32)]
    tcs = [4, 6]
    idx = model.encode(vids, tcs)
    rec = model.decode_indices(idx, [v.shape[1:] for v in vids])
    return cfg, model, vids, tcs, idx, rec


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.3
    q = quantize_kernel(w)
    assert q["q"].dtype == np.int8 and q["q"].shape == w.shape
    assert q["s"].shape == (48,)
    back = np.asarray(q["q"], np.float32) * np.asarray(q["s"])
    # symmetric per-channel int8: max error is half an lsb per channel
    lsb = np.asarray(q["s"])[None, :]
    assert np.all(np.abs(back - w) <= 0.5 * lsb + 1e-7)


def test_quantize_params_structure(served):
    _, model, *_ = served
    qp = quantize_params(model.params)
    import jax.tree_util as jtu

    flat = {jtu.keystr(k): v
            for k, v in jtu.tree_flatten_with_path(model.params)[0]}
    qflat = {jtu.keystr(k): v for k, v in jtu.tree_flatten_with_path(qp)[0]}
    n_kernels = sum("'kernel'" in k and v.ndim == 2 for k, v in flat.items())
    n_q = sum(k.endswith("['q']") for k in qflat)
    assert n_q == n_kernels > 0
    # non-kernel leaves untouched
    for k, v in flat.items():
        if "'kernel'" not in k or v.ndim != 2:
            np.testing.assert_array_equal(np.asarray(qflat[k]), np.asarray(v))
    # dequantize inverts (up to rounding)
    dq = {jtu.keystr(k): v
          for k, v in jtu.tree_flatten_with_path(dequantize_params(qp))[0]}
    for k, v in flat.items():
        scale = max(float(np.max(np.abs(np.asarray(v)))), 1e-12)
        assert np.max(np.abs(np.asarray(dq[k], np.float32)
                             - np.asarray(v))) <= 0.005 * scale + 1e-7, k


@pytest.mark.parametrize("mode", ["w8a16", "w8a8"])
def test_quantized_serving_close_to_f32(served, mode):
    _, model, vids, tcs, idx_ref, rec_ref = served
    qm = quantize_model(model, mode=mode)
    idx_q = qm.encode(vids, tcs)
    agree = np.mean([np.mean(np.asarray(a) == np.asarray(b))
                     for a, b in zip(idx_ref, idx_q)])
    assert agree >= 0.98, agree  # FSQ bins are coarse; int8 rarely flips one
    rec_q = qm.decode_indices(idx_ref, [v.shape[1:] for v in vids])
    for a, b in zip(rec_ref, rec_q):
        mse = float(np.mean((np.asarray(a, np.float32)
                             - np.asarray(b, np.float32)) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        # measured ~53 dB (both modes) on the tiny model; 40 leaves margin
        assert psnr > 40.0, (mode, psnr)
    # the original model is untouched by quantize_model
    assert model.params is not qm.params
    rec_again = model.decode_indices(idx_ref, [v.shape[1:] for v in vids])
    for a, b in zip(rec_ref, rec_again):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_export_roundtrip(served, tmp_path):
    from titok_tpu.serving.quant import quantized_apply
    from tools.export_model import export_model, load_exported

    _, model, *_ = served
    example = model._dummy_batch()
    export_model(model.module, model.params, model.vq_state, example,
                 str(tmp_path), quant="w8a8")
    fwd, dec, meta = load_exported(str(tmp_path))
    assert meta["quant"] == "w8a8"
    recon, idx = fwd(example)
    qp = quantize_params(model.params)
    ref_recon, ref_aux = quantized_apply(
        model.module, {"params": qp}, example, None, mode="w8a8"
    )
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(ref_aux["indices"]))
    np.testing.assert_allclose(np.asarray(recon, np.float32),
                               np.asarray(ref_recon, np.float32),
                               rtol=1e-5, atol=1e-5)
    rec2 = dec(idx, example)
    assert np.asarray(rec2).shape == np.asarray(recon).shape


def test_unquantized_kernels_fall_through(served):
    """A tree with only SOME kernels quantized serves correctly: stock
    Dense handles the float kernels, int8 Dense the quantized ones."""
    import jax

    from titok_tpu.serving.quant import quantized_apply

    _, model, vids, tcs, idx_ref, _ = served
    qp = quantize_params(model.params)
    # un-quantize the encoder's proj_in back to float
    import copy

    mixed = copy.deepcopy(qp)
    d = mixed
    for k in ("encoder", "proj_in"):
        d = d[k]
    orig = model.params["encoder"]["proj_in"]["kernel"]
    d["kernel"] = np.asarray(orig)
    batch = model._pack(vids, tcs).device_arrays()
    _, aux = jax.jit(
        lambda p, b: quantized_apply(model.module, {"params": p}, b, None,
                                     mode="w8a16")
    )(mixed, batch)
    assert np.asarray(aux["indices"]).shape[0] == batch["segment_ids"].shape[0]
