"""Device-side PSNR over packed buffers (jittable eval fast path).

The torchmetrics-equivalent PSNR (``psnr_ssim.py``) runs on host numpy
after unpacking; for large eval epochs the squared-error accumulation can
stay on device for free — per-sample sums via ``segment_sum`` on the packed
patch rows, identical math to the global-accumulation host metric
(patchify is a permutation of pixels, so packed-row SSE == pixel SSE).

Usage inside a jitted eval step:

    sse, cnt = packed_psnr_stats(recon_rows, batch)
    # host: accumulate sse/cnt across batches; psnr = 10*log10(4 / (sse/cnt))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from titok_tpu.ops.patchify import decode_rows


def packed_psnr_stats(recon_rows: jnp.ndarray, batch: dict):
    """(sum_squared_error, pixel_count) over the valid patch rows, with the
    reconstruction clamped to [-1, 1] as the eval hub does."""
    target = decode_rows(batch["patches"], jnp.float32)
    recon = jnp.clip(recon_rows.astype(jnp.float32), -1.0, 1.0)
    mask = ((~batch["token_mask"]) & (batch["segment_ids"] > 0)).astype(
        jnp.float32
    )[:, None]
    diff2 = (recon - target) ** 2 * mask
    sse = diff2.sum()
    cnt = mask.sum() * recon_rows.shape[-1]
    return sse, cnt


def psnr_from_stats(sse: float, cnt: float, data_range: float = 2.0) -> float:
    mse = sse / max(cnt, 1.0)
    return float(10 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12)))
