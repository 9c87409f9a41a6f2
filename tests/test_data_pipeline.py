"""End-to-end data pipeline tests: chunking → packing over CSV and WDS
backends with real (mpeg4) encoded videos through the native decoder."""

import csv
import os

import numpy as np
import pytest

from tests.util import tiny_config
from titok_tpu.data.convert_to_wds import convert
from titok_tpu.data.csv_dataset import csv_batches
from titok_tpu.data.video_reader import encode_video
from titok_tpu.data.wds_dataset import expand_shards, wds_batches

PATCH = [2, 4, 4]


def _write_videos(dirpath, n=3, rng=None):
    rng = rng or np.random.default_rng(0)
    paths = []
    for i in range(n):
        t = int(rng.integers(12, 24))
        frames = (rng.uniform(0, 255, size=(t, 32, 40, 3))).astype(np.uint8)
        p = os.path.join(dirpath, f"v{i}.mp4")
        encode_video(p, frames, fps=8.0, codec="mpeg4")
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    _write_videos(str(d))
    return str(d)


def _data_config(csv_path):
    cfg = tiny_config()
    cfg.set_dotted("dataset.train_dataset", csv_path)
    cfg.set_dotted("dataset.eval_dataset", csv_path)
    cfg.set_dotted("training.sampling.min_grid", [2, 8, 8])
    cfg.set_dotted("training.sampling.max_grid", [6, 24, 24])
    cfg.set_dotted("training.sampling.fps_range", [2, 8])
    cfg.set_dotted("training.sampling.train_seq_len", 256)
    cfg.set_dotted("training.sampling.eval_seq_len", 256)
    cfg.set_dotted("training.eval.eval_samples", 6)
    return cfg


@pytest.fixture(scope="module")
def csv_file(video_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv") / "train.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path"])
        w.writeheader()
        for p in sorted(os.listdir(video_dir)):
            w.writerow({"path": os.path.join(video_dir, p)})
    return path


def test_csv_train_batches(csv_file):
    cfg = _data_config(csv_file)
    it = csv_batches(cfg, eval=False, seed=0)
    batches = [next(it) for _ in range(4)]
    for b in batches:
        assert b.num_samples >= 1
        used = int(b.token_counts.sum() + b.grid_sizes.sum())
        assert used <= 256
        # patch rows are normalized to [-1, 1]
        pr = np.asarray(b.patches, np.float32)
        assert pr.min() >= -1.001 and pr.max() <= 1.001
        # token counts within configured range
        tcs = b.token_counts[b.sample_valid]
        assert (tcs >= 1).all() and (tcs <= 8).all()


def test_csv_eval_batches_bounded(csv_file):
    cfg = _data_config(csv_file)
    batches = list(csv_batches(cfg, eval=True, seed=0))
    total = sum(b.num_samples for b in batches)
    assert 0 < total <= 7  # eval_samples=6 (+carry slack), then stream ends


def test_brace_expansion():
    assert expand_shards("s-{00..02}.tar") == ["s-00.tar", "s-01.tar", "s-02.tar"]
    assert expand_shards("plain.tar") == ["plain.tar"]


def test_wds_roundtrip(video_dir, tmp_path_factory, csv_file):
    out = str(tmp_path_factory.mktemp("shards"))
    n = convert(video_dir, out, shard_size=2)
    assert n == 3
    shards = sorted(os.listdir(out))
    assert len(shards) == 2  # 3 samples, shard size 2

    cfg = _data_config(csv_file)
    cfg.set_dotted("dataset.train_dataset", os.path.join(out, "{00000..00001}.tar"))
    cfg.set_dotted("dataset.eval_dataset", os.path.join(out, "{00000..00001}.tar"))
    it = wds_batches(cfg, eval=False, seed=0)
    b = next(it)
    assert b.num_samples >= 1
    assert int(b.token_counts.sum() + b.grid_sizes.sum()) <= 256


def test_wds_rejects_remote():
    cfg = _data_config("x")
    cfg.set_dotted("dataset.train_dataset", "hf://datasets/foo/{000..001}.tar")
    with pytest.raises(Exception, match="egress|remote"):
        next(wds_batches(cfg, eval=False))


def _batch_fingerprint(b):
    return (
        b.patches.tobytes(), b.segment_ids.tobytes(), b.token_mask.tobytes(),
        b.token_counts.tobytes(), b.grids.tobytes(),
    )


def test_csv_workers_deterministic(csv_file):
    """The parallel decode stream must be a pure function of the seed:
    round-robin fan-in makes batch order independent of thread timing."""
    cfg = _data_config(csv_file)
    cfg.set_dotted("dataset.workers", 3)
    runs = []
    for _ in range(2):
        it = csv_batches(cfg, eval=False, seed=7)
        runs.append([_batch_fingerprint(next(it)) for _ in range(5)])
    assert runs[0] == runs[1]


def test_csv_workers_valid_batches(csv_file):
    cfg = _data_config(csv_file)
    cfg.set_dotted("dataset.workers", 2)
    it = csv_batches(cfg, eval=False, seed=0)
    for _ in range(3):
        b = next(it)
        assert b.num_samples >= 1
        assert int(b.token_counts.sum() + b.grid_sizes.sum()) <= 256


def test_wds_workers_deterministic(video_dir, tmp_path_factory, csv_file):
    out = str(tmp_path_factory.mktemp("shards_w"))
    convert(video_dir, out, shard_size=2)
    cfg = _data_config(csv_file)
    spec = os.path.join(out, "{00000..00001}.tar")
    cfg.set_dotted("dataset.train_dataset", spec)
    cfg.set_dotted("dataset.eval_dataset", spec)
    cfg.set_dotted("dataset.workers", 2)
    runs = []
    for _ in range(2):
        it = wds_batches(cfg, eval=False, seed=3)
        runs.append([_batch_fingerprint(next(it)) for _ in range(4)])
    assert runs[0] == runs[1]


def test_worker_pool_merges_all_and_propagates_errors():
    from titok_tpu.data.workers import WorkerPool

    pool = WorkerPool([lambda: iter([0, 2, 4]), lambda: iter([1, 3])])
    assert list(pool) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("decode exploded")

    pool = WorkerPool([boom])
    it = iter(pool)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(it)
