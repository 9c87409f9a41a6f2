"""DataParallelTrainer end-to-end on the 8-virtual-device CPU mesh."""

import csv
import json
import os

import pytest

from tests.test_data_pipeline import _write_videos
from tests.test_trainer_integration import _cfg
from titok_tpu.parallel.trainer import DataParallelTrainer


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("videos"))
    _write_videos(d)
    path = os.path.join(d, "train.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path"])
        w.writeheader()
        for p in sorted(os.listdir(d)):
            if p.endswith(".mp4"):
                w.writerow({"path": os.path.join(d, p)})
    return path


def test_dp_fit(csv_file, tmp_path):
    cfg = _cfg(csv_file, tmp_path / "dp_run")
    cfg.set_dotted("training.main.train_devices", 4)
    cfg.set_dotted("training.main.max_steps", 3)
    cfg.set_dotted("training.eval.eval_step_interval", 2)
    trainer = DataParallelTrainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 3

    lines = [json.loads(l) for l in
             open(os.path.join(cfg.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    assert any("train/gen/total_loss" in l for l in lines)
    assert any(l.get("perf/devices") == 4 for l in lines)
    assert any("eval/psnr" in l for l in lines)


def test_dp_fit_uint8_wire(csv_file, tmp_path):
    """DP mesh fit on the uint8 wire with real mp4 (uint8-source) clips:
    the per-shard decode_rows path + device eval metrics under vmap."""
    cfg = _cfg(csv_file, tmp_path / "dp_u8")
    cfg.set_dotted("training.main.train_devices", 4)
    cfg.set_dotted("training.main.max_steps", 2)
    cfg.set_dotted("training.eval.eval_step_interval", 2)
    cfg.set_dotted("dataset.uint8_wire", True)
    trainer = DataParallelTrainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 2
    lines = [json.loads(l) for l in
             open(os.path.join(cfg.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    import numpy as np

    losses = [l["train/gen/total_loss"] for l in lines
              if "train/gen/total_loss" in l]
    assert losses and np.isfinite(losses).all()
    assert any("eval/psnr" in l for l in lines)


def test_dp_fit_resume(csv_file, tmp_path):
    """resume_from_checkpoint is honored by the DP-family trainers
    (previously only the single-device Trainer restored; the DP fit
    initialized fresh and silently ignored the config key)."""
    cfg = _cfg(csv_file, tmp_path / "dp_resume")
    cfg.set_dotted("training.main.train_devices", 2)
    cfg.set_dotted("training.main.max_steps", 2)
    cfg.set_dotted("training.eval.eval_step_interval", 100)
    cfg.set_dotted("general.checkpoints.save_interval", 2)
    trainer = DataParallelTrainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 2

    cfg2 = _cfg(csv_file, tmp_path / "dp_resume")
    cfg2.set_dotted("training.main.train_devices", 2)
    cfg2.set_dotted("training.main.max_steps", 4)
    cfg2.set_dotted("training.eval.eval_step_interval", 100)
    cfg2.set_dotted("general.checkpoints.save_interval", 100)
    cfg2.set_dotted("general.checkpoints.resume_from_checkpoint", True)
    trainer2 = DataParallelTrainer(cfg2)
    state2 = trainer2.fit()
    # continued from step 2, ran 2 more
    assert int(state2.step) == 4
