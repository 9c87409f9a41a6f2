"""jax.export serving artifacts: exported programs must match the live
module (FSQ + EMA-VQ families) when deserialized WITHOUT model code."""

import numpy as np
import pytest

from tests.util import tiny_config
from titok_tpu.models.titok import TiTokModel, make_titok
from tools.export_model import export_model, load_exported


def _model(quantizer="fsq"):
    cfg = tiny_config()
    cfg.set_dotted("tokenizer.model.quantizer", quantizer)
    if quantizer == "vq":
        cfg.set_dotted("tokenizer.model.vq", {"codebook_size": 64})
    module = make_titok(cfg)
    return TiTokModel(module, seq_len=512, min_grid=(2, 8, 8))


@pytest.mark.parametrize("quantizer", ["fsq", "vq"])
def test_export_roundtrip(tmp_path, quantizer):
    model = _model(quantizer)
    rng = np.random.default_rng(0)
    vid = rng.uniform(-1, 1, size=(3, 4, 16, 16)).astype(np.float32)
    batch = model._pack([vid], [5]).device_arrays()

    out = str(tmp_path / "exp")
    export_model(model.module, model.params, model.vq_state, batch, out)

    fwd, dec, meta = load_exported(out)
    assert meta["seq_len"] == 512 and meta["quantizer"] == quantizer

    recon, idx = fwd(batch)
    ref_recon, ref_aux = model._jit_forward(model.params, model.vq_state, batch)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(ref_aux["indices"]))
    np.testing.assert_allclose(np.asarray(recon, np.float32),
                               np.asarray(ref_recon, np.float32),
                               rtol=1e-5, atol=1e-5)

    # decode-from-indices path: must reproduce the forward's reconstruction
    rec2 = dec(idx, batch)
    ref_rec2 = model._jit_decode_indices(
        model.params, model.vq_state, ref_aux["indices"], batch
    )
    np.testing.assert_allclose(np.asarray(rec2, np.float32),
                               np.asarray(ref_rec2, np.float32),
                               rtol=1e-5, atol=1e-5)
