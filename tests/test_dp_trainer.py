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
    # train-probe pass through the mesh-parallel eval path
    cfg.set_dotted("training.eval.train_probe_dataset", csv_file)
    cfg.set_dotted("training.eval.train_probe_samples", 2)
    trainer = DataParallelTrainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 3

    lines = [json.loads(l) for l in
             open(os.path.join(cfg.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    import numpy as np

    assert any("train/gen/total_loss" in l for l in lines)
    assert any(l.get("perf/devices") == 4 for l in lines)
    assert any("eval/psnr" in l for l in lines)
    probe = [l["eval/train_psnr"] for l in lines if "eval/train_psnr" in l]
    assert probe and np.isfinite(probe).all()


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


def test_dp_steps_per_call_matches_k1(csv_file, tmp_path):
    """DP scan mode (steps_per_call=2 over a 2-device mesh, tail of 1) ==
    the one-step-per-dispatch DP loop on the same deterministic stream;
    cadence artifacts (per-step metrics, eval, checkpoints) still appear."""
    import jax
    import numpy as np

    cfg1 = _cfg(csv_file, tmp_path / "dpk1")
    cfg1.set_dotted("tokenizer.losses.disc_weight", 0.4)
    cfg1.set_dotted("training.main.train_devices", 2)
    cfg1.set_dotted("training.main.max_steps", 5)
    state1 = DataParallelTrainer(cfg1).fit()

    cfg2 = _cfg(csv_file, tmp_path / "dpk2")
    cfg2.set_dotted("tokenizer.losses.disc_weight", 0.4)
    cfg2.set_dotted("training.main.train_devices", 2)
    cfg2.set_dotted("training.main.max_steps", 5)
    cfg2.set_dotted("training.main.steps_per_call", 2)  # tail of 1
    state2 = DataParallelTrainer(cfg2).fit()

    assert int(state1.step) == int(state2.step) == 5

    def assert_same_trajectory(t1, t2):
        for a, b in zip(jax.tree_util.tree_leaves(t1),
                        jax.tree_util.tree_leaves(t2)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = max(float(np.linalg.norm(a)), 1e-6)
            assert float(np.linalg.norm(a - b)) / denom < 5e-3

    assert_same_trajectory(state1.gen_params, state2.gen_params)
    assert_same_trajectory(state1.disc_params, state2.disc_params)

    lines = [json.loads(l) for l in
             open(os.path.join(cfg2.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    assert any("train/gen/total_loss" in l for l in lines)
    assert any(l.get("perf/devices") == 2 for l in lines)
    assert any("eval/psnr" in l and l["step"] == 5 for l in lines)
    steps = [d for d in os.listdir(cfg2.general.checkpoints.save_path)
             if d.isdigit()]
    assert steps


def test_fsdp_steps_per_call(csv_file, tmp_path):
    """FSDP composes with scan mode: the output-state sharding pin wraps
    the whole K-step scan and the trained state stays sharded."""
    import jax

    from titok_tpu.parallel.fsdp import FSDPTrainer

    cfg = _cfg(csv_file, tmp_path / "fsdpk2")
    cfg.set_dotted("training.main.train_devices", 4)
    cfg.set_dotted("training.main.fsdp", True)
    cfg.set_dotted("training.main.max_steps", 4)
    cfg.set_dotted("training.main.steps_per_call", 2)
    cfg.set_dotted("training.eval.eval_step_interval", 100)
    state = FSDPTrainer(cfg).fit()
    assert int(state.step) == 4
    n_split = sum(
        len({s.device.id for s in leaf.addressable_shards}) > 1
        for leaf in jax.tree_util.tree_leaves(state.gen_params)
    )
    assert n_split > 0
