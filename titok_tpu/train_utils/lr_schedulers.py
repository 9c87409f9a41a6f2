"""LR schedules (reference ``train_utils/lr_schedulers.py``).

Only ``cosine`` is registered in the reference (``lr_schedulers.py:66-68``):
linear warmup then cosine decay to a configurable floor ``end_lr``
(``lr_schedulers.py:55-63``). Implemented as a plain optax-style
``step -> lr`` callable; the reference's LambdaLR multiplier times base_lr
equals this function exactly.
"""

from __future__ import annotations

import math


def get_cosine_schedule_with_warmup(
    num_warmup_steps: int,
    num_training_steps: int,
    base_lr: float = 1e-4,
    end_lr: float = 0.0,
    num_cycles: float = 0.5,
):
    """Return ``f(step) -> lr`` matching reference ``lr_schedulers.py:55-63``."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps
        )
        ratio = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        decay = end_lr + (base_lr - end_lr) * ratio
        return jnp.where(step < num_warmup_steps, warm * base_lr, decay)

    return schedule


SCHEDULES = {"cosine": get_cosine_schedule_with_warmup}


def get_scheduler(name: str, num_warmup_steps: int, num_training_steps: int,
                  base_lr: float = 1e-4, end_lr: float = 0.0):
    """Registry lookup (reference ``lr_schedulers.py:70-108``)."""
    if name not in SCHEDULES:
        raise ValueError(f"unknown scheduler {name!r}; available: {list(SCHEDULES)}")
    return SCHEDULES[name](num_warmup_steps, num_training_steps, base_lr, end_lr)
