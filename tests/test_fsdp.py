"""FSDP (ZeRO-3-style state sharding, parallel/fsdp.py) on the 8-device
virtual CPU mesh: sharded-state step == replicated-state DP step, state
stays sharded across steps, and the trainer runs e2e.

The reference has no sharded-state mode (Lightning DDP replicates,
reference train.py:270-274); this is a TPU-native scaling extension."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tests.test_parallel import _batch
from tests.util import tiny_config
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.models.titok import make_titok
from titok_tpu.parallel.fsdp import (
    MIN_SHARD_ELEMS,
    fsdp_shardings,
    fsdp_spec_for,
    shard_state_fsdp,
)
from titok_tpu.parallel.mesh import make_mesh, shard_batch_tree
from titok_tpu.parallel.train_step import DPTrainStepBuilder


def test_fsdp_spec_rules():
    big2d = np.zeros((256, 768))       # both dims divisible by 4
    assert fsdp_spec_for(big2d, 4) == P(None, "data")   # largest dim wins
    assert fsdp_spec_for(np.zeros(()), 4) == P()        # scalar
    assert fsdp_spec_for(np.zeros((768,)), 4) == P()    # < MIN_SHARD_ELEMS
    assert np.zeros((768,)).size < MIN_SHARD_ELEMS
    assert fsdp_spec_for(np.zeros((16384, 5)), 4) == P("data", None)
    # no divisible dim -> replicated
    assert fsdp_spec_for(np.zeros((9973, 3)), 4) == P()
    # ties broken toward the earlier dim, deterministically
    assert fsdp_spec_for(np.zeros((512, 512)), 4) == P("data", None)


def _n_devices_of(arr):
    return len({s.device.id for s in arr.addressable_shards})


def test_fsdp_step_equals_dp_and_stays_sharded(rng):
    """Full GAN step from an FSDP-sharded state == the same step from a
    replicated state (all-gather is exact; only reassociation differs),
    and the output state keeps the FSDP shardings through the optimizer
    update (the trainer's with_sharding_constraint pin)."""
    from titok_tpu.data.packing import build_disc_batch

    cfg = tiny_config(**{"tokenizer.losses.disc_weight": 0.4})
    model = make_titok(cfg)
    ls = LossSystem(cfg)

    D = 4
    mesh = make_mesh(D)
    batches = [_batch(np.random.default_rng(i)) for i in range(D)]
    discs = [build_disc_batch(b, ls.disc_tokens) for b in batches]
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[b.device_arrays() for b in batches]
    )
    stacked_d = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[d.device_arrays() for d in discs]
    )

    dp = DPTrainStepBuilder(model, ls, cfg)
    state = dp.init_state(jax.random.PRNGKey(0), stacked, stacked_d)
    shardings = fsdp_shardings(state, mesh)
    fsdp_state = shard_state_fsdp(state, mesh)

    # some large kernel actually got split over >1 device
    n_split = sum(
        _n_devices_of(leaf) > 1
        for leaf in jax.tree_util.tree_leaves(fsdp_state.gen_params)
    )
    assert n_split > 0

    fn = dp.make_train_step({})

    def pinned(s, b, d, p):
        ns, m, i = fn(s, b, d, p)
        return jax.lax.with_sharding_constraint(ns, shardings), m, i

    step = jax.jit(pinned, donate_argnums=())
    sharded_b = shard_batch_tree(stacked, mesh)
    sharded_d = shard_batch_tree(stacked_d, mesh)

    ref_state, ref_metrics, ref_idx = jax.jit(fn, donate_argnums=())(
        state, sharded_b, sharded_d, None
    )
    new_state, metrics, idx = step(fsdp_state, sharded_b, sharded_d, None)

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )
    flat_new = jax.tree_util.tree_leaves(new_state.gen_params)
    flat_ref = jax.tree_util.tree_leaves(ref_state.gen_params)
    for a, b in zip(flat_new, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
        )

    # output params kept their input shardings (memory win survives a step)
    for (path, leaf_in), leaf_out in zip(
        jax.tree_util.tree_flatten_with_path(fsdp_state.gen_params)[0],
        jax.tree_util.tree_leaves(new_state.gen_params),
    ):
        if _n_devices_of(leaf_in) > 1:
            assert _n_devices_of(leaf_out) > 1, path
            assert leaf_out.sharding.is_equivalent_to(
                leaf_in.sharding, leaf_in.ndim
            ), path


def test_fsdp_trainer_e2e(tmp_path):
    """FSDPTrainer fits end-to-end via the CLI dispatch surface and leaves
    the trained state sharded."""
    import csv
    import json
    import os

    from tests.test_data_pipeline import _write_videos
    from tests.test_trainer_integration import _cfg
    from titok_tpu.parallel.fsdp import FSDPTrainer

    d = str(tmp_path / "videos")
    os.makedirs(d)
    _write_videos(d)
    csv_path = os.path.join(d, "train.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path"])
        w.writeheader()
        for p in sorted(os.listdir(d)):
            if p.endswith(".mp4"):
                w.writerow({"path": os.path.join(d, p)})

    cfg = _cfg(csv_path, tmp_path / "fsdp_run")
    cfg.set_dotted("training.main.train_devices", 4)
    cfg.set_dotted("training.main.fsdp", True)
    cfg.set_dotted("training.main.max_steps", 3)
    cfg.set_dotted("training.eval.eval_step_interval", 2)
    trainer = FSDPTrainer(cfg)
    state = trainer.fit()
    assert int(state.step) == 3
    n_split = sum(
        _n_devices_of(leaf) > 1
        for leaf in jax.tree_util.tree_leaves(state.gen_params)
    )
    assert n_split > 0

    lines = [json.loads(l) for l in
             open(os.path.join(cfg.general.checkpoints.save_path,
                               "metrics.jsonl"))]
    losses = [l["train/gen/total_loss"] for l in lines
              if "train/gen/total_loss" in l]
    assert losses and np.isfinite(losses).all()
    assert any("eval/psnr" in l for l in lines)


def test_train_py_rejects_fsdp_with_tp(tmp_path):
    """train.py's dispatch refuses fsdp x TP/CP compositions up front."""
    import train as train_cli

    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text(
        "training:\n  main:\n"
        "    train_devices: 2\n    tp_devices: 2\n    fsdp: true\n"
    )
    with pytest.raises(ValueError, match="fsdp"):
        train_cli.main([f"config={yaml_path}"])
