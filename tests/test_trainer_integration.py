"""Full-loop integration: tiny CSV config end-to-end N steps on CPU,
checkpoint save + resume (SURVEY.md §4 integration tier)."""

import csv
import json
import os

import numpy as np
import pytest

from tests.test_data_pipeline import _write_videos
from tests.util import tiny_config
from titok_tpu.training.trainer import Trainer, select_data_backend


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


def _cfg(csv_file, tmp_path, **over):
    cfg = tiny_config(**over)
    cfg.set_dotted("dataset.train_dataset", csv_file)
    cfg.set_dotted("dataset.eval_dataset", csv_file)
    cfg.set_dotted("general.checkpoints.save_path", str(tmp_path))
    cfg.set_dotted("general.checkpoints.save_interval", 2)
    cfg.set_dotted("training.sampling.min_grid", [2, 8, 8])
    cfg.set_dotted("training.sampling.max_grid", [6, 24, 24])
    cfg.set_dotted("training.sampling.fps_range", [2, 8])
    cfg.set_dotted("training.sampling.train_seq_len", 192)
    cfg.set_dotted("training.sampling.eval_seq_len", 192)
    cfg.set_dotted("training.eval.eval_samples", 4)
    cfg.set_dotted("training.eval.eval_step_interval", 3)
    cfg.set_dotted("training.eval.log_recon_num", 1)
    cfg.set_dotted("training.main.max_steps", 4)
    cfg.set_dotted("general.wandb.log_step_interval", 1)
    return cfg


def test_fit_and_resume(csv_file, tmp_path):
    cfg = _cfg(csv_file, tmp_path / "run")
    trainer = Trainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 4

    # metrics were logged
    lines = [json.loads(l) for l in
             open(os.path.join(cfg.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    assert any("train/gen/total_loss" in l for l in lines)
    assert any("eval/psnr" in l for l in lines)
    # final eval at max_steps (runs end with metrics AT the last step, not
    # eval_step_interval short of it)
    assert any("eval/psnr" in l and l["step"] == 4 for l in lines)
    # recon video written
    vids = os.listdir(os.path.join(cfg.general.checkpoints.save_path, "videos"))
    assert vids

    # resume continues from the saved step
    cfg2 = _cfg(csv_file, tmp_path / "run")
    cfg2.set_dotted("general.checkpoints.resume_from_checkpoint", True)
    cfg2.set_dotted("training.main.max_steps", 6)
    trainer2 = Trainer(cfg2)
    state2 = trainer2.fit()
    assert int(state2.step) == 6

    # weights-only init from the checkpoint dir
    latest = trainer2.ckpt.latest_step()
    ckpt_path = os.path.join(str(tmp_path / "run"), str(latest))
    cfg3 = _cfg(csv_file, tmp_path / "run3")
    cfg3.set_dotted("general.checkpoints.init_from_checkpoint", ckpt_path)
    cfg3.set_dotted("training.main.max_steps", 1)
    trainer3 = Trainer(cfg3)
    state3 = trainer3.fit()
    assert int(state3.step) == 1


def test_train_probe_metrics(csv_file, tmp_path):
    """train_probe_dataset adds eval/train_psnr scored with the held-out
    protocol (capacity-vs-data-ceiling analysis, round-3 verdict weak #5)."""
    cfg = _cfg(csv_file, tmp_path / "probe")
    cfg.set_dotted("training.main.max_steps", 3)
    cfg.set_dotted("training.eval.train_probe_dataset", csv_file)
    cfg.set_dotted("training.eval.train_probe_samples", 2)
    trainer = Trainer(cfg)
    trainer.fit()
    lines = [json.loads(l) for l in
             open(os.path.join(cfg.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    rows = [l for l in lines if "eval/train_psnr" in l]
    assert rows, "train-probe PSNR was not logged"
    assert np.isfinite(rows[-1]["eval/train_psnr"])
    # probe cache is built once and reused across validate() calls
    assert len(trainer._train_probe_cache) >= 1


def test_backend_selection(csv_file):
    cfg = tiny_config()
    cfg.set_dotted("dataset.train_dataset", csv_file)
    cfg.set_dotted("dataset.eval_dataset", csv_file)
    from titok_tpu.data.csv_dataset import csv_batches

    assert select_data_backend(cfg) is csv_batches
    cfg.set_dotted("dataset.train_dataset", "x.tar")
    cfg.set_dotted("dataset.eval_dataset", "y.tar")
    from titok_tpu.data.wds_dataset import wds_batches

    assert select_data_backend(cfg) is wds_batches


def test_synthetic_backend_selection():
    from tests.util import tiny_config
    from titok_tpu.training.trainer import select_data_backend, synthetic_batches

    cfg = tiny_config()
    cfg.set_dotted("dataset.train_dataset", "synthetic")
    cfg.set_dotted("dataset.eval_dataset", "synthetic")
    assert select_data_backend(cfg) is synthetic_batches
    batch = next(iter(synthetic_batches(cfg, eval=False, seed=0)))
    assert batch.num_samples >= 1
    evals = list(synthetic_batches(cfg, eval=True, seed=0))
    assert sum(b.num_samples for b in evals) >= 1


def test_steps_per_call_matches_single_step(csv_file, tmp_path):
    """K steps per dispatch (lax.scan) == the one-step-per-dispatch loop:
    same data stream + seeds -> same final params; cadence artifacts
    (train/eval metrics lines, checkpoints) still appear. Includes the
    unaligned tail (max_steps % K != 0) driven through the scan program's
    sub-batch slices."""
    import jax

    cfg1 = _cfg(csv_file, tmp_path / "k1")
    cfg1.set_dotted("tokenizer.losses.disc_weight", 0.4)
    cfg1.set_dotted("training.main.max_steps", 7)
    state1 = Trainer(cfg1).fit()

    cfg3 = _cfg(csv_file, tmp_path / "k3")
    cfg3.set_dotted("tokenizer.losses.disc_weight", 0.4)
    cfg3.set_dotted("training.main.max_steps", 7)
    cfg3.set_dotted("training.main.steps_per_call", 3)  # tail of 1
    state3 = Trainer(cfg3).fit()

    assert int(state1.step) == int(state3.step) == 7

    # scan vs unrolled XLA programs reassociate differently; the GAN's
    # finite-diff penalties amplify that rounding on individual near-zero
    # disc weights. Compare trajectories by relative norm per leaf — tight
    # enough that a data/rng mismatch (different batches consumed) fails.
    def assert_same_trajectory(t1, t3):
        for a, b in zip(jax.tree_util.tree_leaves(t1),
                        jax.tree_util.tree_leaves(t3)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = max(float(np.linalg.norm(a)), 1e-6)
            assert float(np.linalg.norm(a - b)) / denom < 5e-3

    assert_same_trajectory(state1.gen_params, state3.gen_params)
    assert_same_trajectory(state1.disc_params, state3.disc_params)

    lines = [json.loads(l) for l in
             open(os.path.join(cfg3.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    assert any("train/gen/total_loss" in l for l in lines)
    assert any("train/disc/d_loss" in l for l in lines)
    # final eval fires at max_steps in scan mode too
    assert any("eval/psnr" in l and l["step"] == 7 for l in lines)
    # interval-crossing checkpoints exist (save_interval=2 with K=3)
    steps = [d for d in os.listdir(cfg3.general.checkpoints.save_path)
             if d.isdigit()]
    assert steps


def test_steps_per_call_vq_family(csv_file, tmp_path):
    """EMA-VQ state (codebook/EMA stats/ages) threads through the scan
    carry: a K=2 run trains, keeps a healthy codebook, and checkpoints."""
    cfg = _cfg(csv_file, tmp_path / "vqk2")
    cfg.set_dotted("tokenizer.model.quantizer", "vq")
    cfg.set_dotted("tokenizer.model.vq", {"codebook_size": 32})
    cfg.set_dotted("training.main.max_steps", 4)
    cfg.set_dotted("training.main.steps_per_call", 2)
    state = Trainer(cfg).fit()
    assert int(state.step) == 4
    assert np.all(np.isfinite(np.asarray(state.vq_state.codebook)))
    lines = [json.loads(l) for l in
             open(os.path.join(cfg.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    assert any("train/gen/vq_perplexity" in l for l in lines)
