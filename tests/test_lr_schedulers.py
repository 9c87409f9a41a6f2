"""Cosine LR schedule golden parity vs the reference torch LambdaLR
(reference ``train_utils/lr_schedulers.py`` is importable: torch-only)."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, has_reference
from titok_tpu.train_utils.lr_schedulers import get_scheduler


@pytest.mark.skipif(not has_reference(), reason="reference not available")
def test_cosine_schedule_matches_reference():
    import torch

    sys.path.insert(0, REFERENCE)
    from train_utils.lr_schedulers import get_scheduler as ref_get_scheduler

    base_lr, end_lr = 1e-4, 1e-5
    warm, total = 1000, 600000

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    ref_sched = ref_get_scheduler("cosine", opt, num_warmup_steps=warm,
                                  num_training_steps=total, base_lr=base_lr,
                                  end_lr=end_lr)
    ours = get_scheduler("cosine", warm, total, base_lr, end_lr)

    for step in [0, 1, 10, 500, 999, 1000, 1001, 5000, 100000, 300000,
                 599999, 600000]:
        ref_sched.last_epoch = step - 1
        ref_sched.step()  # computes lr at `step`
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(step)), ref_lr, rtol=1e-5,
                                   err_msg=f"step {step}")


def test_warmup_is_linear_from_zero():
    s = get_scheduler("cosine", 100, 1000, 1e-3, 0.0)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(50)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-5)


def test_decays_to_end_lr():
    s = get_scheduler("cosine", 10, 1000, 1e-3, 1e-5)
    np.testing.assert_allclose(float(s(1000)), 1e-5, rtol=1e-4)
