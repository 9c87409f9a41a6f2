"""Train a TiTok-Video tokenizer on TPU.

Reference-compatible CLI (reference ``train.py:223-286``):

    python train.py config=configs/tiny.yaml [dotted.overrides=...]

e.g.  python train.py config=configs/tiny_csv.yaml \\
          optimizer.learning_rate=3e-4 training.main.max_steps=1000
"""

import os
import sys

import numpy as np

from titok_tpu.config import config_from_cli


def _honor_platform_env():
    """The axon sitecustomize forces jax_platforms=axon even over an
    explicit JAX_PLATFORMS env var; restore the user's choice."""
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


_honor_platform_env()


def validate_parallel_config(config):
    """Check mesh-shape / optimizer compatibility before building anything.
    Returns ``(train_devices, cp_devices, tp_devices, fsdp)``."""
    devices = int(config.training.main.get("train_devices", 1))
    cp_devices = int(config.training.main.get("cp_devices", 1))
    tp_devices = int(config.training.main.get("tp_devices", 1))
    fsdp = bool(config.training.main.get("fsdp", False))
    if fsdp and (cp_devices > 1 or tp_devices > 1):
        raise ValueError(
            "training.main.fsdp composes with plain DP only "
            "(cp_devices=tp_devices=1); TP/CP already shard the same bytes"
        )
    # NOTE: Adafactor composes with TP since round 4 — tp_spec_for is
    # rank-aware and shards the factored v_row/v_col vectors along the
    # kernel's sharded dim (tests/test_dptp.py::test_dptp_adafactor_*)
    return devices, cp_devices, tp_devices, fsdp


def main(argv):
    config = config_from_cli(argv)
    np.random.seed(int(config.training.main.get("seed", 0)))

    if bool(config.training.main.get("multihost", False)):
        # one train.py per host; must run before any other jax use so the
        # backend sees the global device topology (reference analog: the
        # DDP spawning Lightning does at reference train.py:270-274)
        from titok_tpu.parallel import multihost

        multihost.initialize_from_config(config)

    devices, cp_devices, tp_devices, fsdp = validate_parallel_config(config)
    if fsdp and devices > 1:
        from titok_tpu.parallel.fsdp import FSDPTrainer as TrainerCls
    elif cp_devices > 1 and tp_devices > 1:
        # full 3-axis [data, seq, model] mesh (data may be 1-wide)
        from titok_tpu.parallel.dpcptp import DPCPTPTrainer as TrainerCls
    elif tp_devices > 1:  # pure TP = DPTPTrainer with a 1-wide data axis
        from titok_tpu.parallel.dptp import DPTPTrainer as TrainerCls
    elif devices > 1 and cp_devices > 1:
        from titok_tpu.parallel.dpcp import DPCPTrainer as TrainerCls
    elif cp_devices > 1:
        from titok_tpu.parallel.cp_trainer import (
            ContextParallelTrainer as TrainerCls,
        )
    elif devices > 1:
        from titok_tpu.parallel.trainer import DataParallelTrainer as TrainerCls
    else:
        from titok_tpu.training.trainer import Trainer as TrainerCls

    trainer = TrainerCls(config)
    trainer.fit()


if __name__ == "__main__":
    main(sys.argv[1:])
