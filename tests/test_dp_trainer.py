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
