"""Config-selected eval metric hub (reference
``model/metrics/eval_metrics.py``).

``update(recon, target)`` consumes *lists of CTHW numpy clips* (unpacked on
the host from the eval step's packed reconstruction). Image metrics see T
as the batch dim (``eval_metrics.py:36-37``); video metrics get BCTHW with
B=1 (``eval_metrics.py:38-39``). Reconstructions are clamped to [-1, 1]
before any metric (``eval_metrics.py:34``).
"""

from __future__ import annotations

import numpy as np

from titok_tpu.metrics.fvd import FVDCalculator
from titok_tpu.metrics.psnr_ssim import PSNRMetric, SSIMMetric


class EvalMetrics:
    def __init__(self, config, eval_prefix: str = "eval", skip=()):
        """``skip``: metric names handled elsewhere (e.g. accumulated on
        device inside the jitted eval step) — excluded from this host hub."""
        self.eval_prefix = eval_prefix
        self.metrics: dict[str, tuple[object, str]] = {}
        for m in config.training.eval.log_metrics:
            if m in skip:
                continue
            if m == "psnr":
                self.metrics[m] = (PSNRMetric(data_range=2.0), "image")
            elif m == "ssim":
                self.metrics[m] = (SSIMMetric(data_range=2.0), "image")
            elif m == "fvd":
                i3d = config.training.eval.get("i3d_path", None)
                self.metrics[m] = (FVDCalculator(i3d_path=i3d), "video")
            elif m == "jedi":
                from titok_tpu.metrics.jedi import JEDiMetric

                self.metrics[m] = (
                    JEDiMetric(
                        model_name=config.training.eval.get(
                            "jedi_jepa_model", "vit_large"),
                        extractor_path=config.training.eval.get(
                            "jedi_extractor_path", None),
                        vjepa_params_path=config.training.eval.get(
                            "jedi_vjepa_params", None),
                    ),
                    "video",
                )
            else:
                raise ValueError(f"unknown eval metric {m!r}")

    def update(self, recon: list, target: list) -> None:
        for x, y in zip(recon, target):
            x = np.clip(np.asarray(x, np.float32), -1, 1)
            y = np.asarray(y, np.float32)
            for metric, kind in self.metrics.values():
                if kind == "image":
                    # CTHW -> TCHW (T becomes batch)
                    metric.update(x.transpose(1, 0, 2, 3), y.transpose(1, 0, 2, 3))
                else:
                    metric.update(x[None], y[None])

    def compute(self) -> dict:
        return {
            f"{self.eval_prefix}/{name}": metric.compute()
            for name, (metric, _) in self.metrics.items()
        }

    def reset(self) -> None:
        for metric, _ in self.metrics.values():
            metric.reset()
