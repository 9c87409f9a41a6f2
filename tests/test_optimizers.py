"""``optimizer.name: adafactor`` — memory-efficient optimizer state
(factored second moments + bf16 momentum, train_step.py make_optimizers).

The reference ships AdamW only (reference ``train.py:170-216``); Adafactor
is the TPU-memory extension that lets the all-large GAN recipe fit one
v5e (see ``tools/flops.py --optimizer adafactor``). These tests pin:
the step trains (loss decreases), the state is materially smaller than
AdamW's, the momentum accumulator is bf16, and the CLI gate rejects the
TP composition whose moment-sharding rules assume AdamW state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util import PATCH, synthetic_videos, tiny_config
from titok_tpu.data.packing import build_disc_batch, pack_samples
from titok_tpu.losses.loss_module import LossSystem
from titok_tpu.models.titok import make_titok
from titok_tpu.training.train_step import TrainStepBuilder


def _make_batch(rng, cfg, n=3):
    vids = synthetic_videos(rng, n)
    tcs = [int(rng.integers(1, 8)) for _ in range(n)]
    return pack_samples(
        vids, tcs, seq_len=cfg.training.sampling.train_seq_len,
        max_samples=8, patch_size=PATCH,
    )


def _tree_bytes(tree) -> int:
    return sum(
        int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "dtype")
    )


def _leaf_names(tree):
    return {
        "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _init(cfg, rng):
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    builder = TrainStepBuilder(model, ls, cfg)
    batch = _make_batch(rng, cfg)
    arrs = batch.device_arrays()
    state = builder.init_state(jax.random.PRNGKey(0), arrs, None)
    return builder, arrs, state


def test_adafactor_overfit(rng):
    """L1 overfit on one batch decreases loss, grads/params stay finite."""
    cfg = tiny_config(**{"optimizer.name": "adafactor"})
    builder, arrs, state = _init(cfg, rng)
    step = jax.jit(builder.make_train_step(lpips_params={}))

    losses = []
    for _ in range(12):
        state, metrics, _ = step(state, arrs, None, None)
        losses.append(float(metrics["gen/total_loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.9, losses


def test_adafactor_state_is_smaller_and_bf16_momentum(rng):
    cfg_af = tiny_config(**{"optimizer.name": "adafactor"})
    cfg_aw = tiny_config()
    r2 = np.random.default_rng(0)
    _, _, st_af = _init(cfg_af, rng)
    _, _, st_aw = _init(cfg_aw, r2)

    af, aw = _tree_bytes(st_af.gen_opt), _tree_bytes(st_aw.gen_opt)
    # AdamW: f32 mu+nu = 8 B/param. Adafactor: factored f32 v_row/v_col
    # (O(rows+cols)) + bf16 momentum = ~2 B/param on the matmul weights.
    assert af < 0.6 * aw, (af, aw)

    names = " ".join(_leaf_names(st_af.gen_opt))
    assert "v_row" in names and "v_col" in names, names

    mom_dtypes = {
        leaf.dtype
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            st_af.gen_opt)[0]
        if any(str(getattr(p, "name", getattr(p, "key", p))) == "ema"
               for p in path)
        and hasattr(leaf, "dtype") and leaf.ndim > 0
    }
    # momentum accumulators are bf16 (optax.ema accumulator_dtype)
    assert mom_dtypes and mom_dtypes <= {jnp.dtype(jnp.bfloat16)}, mom_dtypes


def test_adafactor_no_momentum_drops_accumulator(rng):
    cfg = tiny_config(**{"optimizer.name": "adafactor",
                         "optimizer.adafactor_momentum": 0})
    cfg_m = tiny_config(**{"optimizer.name": "adafactor"})
    r2 = np.random.default_rng(0)
    _, _, st = _init(cfg, rng)
    _, _, st_m = _init(cfg_m, r2)
    assert _tree_bytes(st.gen_opt) < _tree_bytes(st_m.gen_opt)


def test_adafactor_full_gan_step_runs(rng):
    """One GAN step with both towers on Adafactor: finite metrics."""
    cfg = tiny_config(**{
        "optimizer.name": "adafactor",
        "tokenizer.losses.disc_weight": 0.4,
    })
    model = make_titok(cfg)
    ls = LossSystem(cfg)
    builder = TrainStepBuilder(model, ls, cfg)
    batch = _make_batch(rng, cfg)
    disc = build_disc_batch(batch, ls.disc_tokens)
    arrs, darrs = batch.device_arrays(), disc.device_arrays()

    state = builder.init_state(jax.random.PRNGKey(0), arrs, darrs)
    step = jax.jit(builder.make_train_step(lpips_params={}))
    state, metrics, _ = step(state, arrs, darrs, None)
    for key in ["gen/total_loss", "disc/total_loss", "g_lr", "d_lr"]:
        assert np.isfinite(float(metrics[key])), (key, metrics[key])


def test_unknown_optimizer_rejected(rng):
    cfg = tiny_config(**{"optimizer.name": "sgd"})
    model = make_titok(cfg)
    builder = TrainStepBuilder(model, LossSystem(cfg), cfg)
    with pytest.raises(ValueError, match="sgd"):
        builder.make_optimizers()


def test_fsdp_adafactor_step_equals_dp_and_stays_sharded():
    """FSDP composes with Adafactor (the max-memory-headroom pairing):
    the shape-based sharding rule replicates the small factored v_row /
    v_col vectors and shards the bf16 momentum alongside its parameter,
    and the sharded step matches the replicated DP step."""
    from tests.test_parallel import _batch
    from titok_tpu.data.packing import build_disc_batch
    from titok_tpu.parallel.fsdp import fsdp_shardings, shard_state_fsdp
    from titok_tpu.parallel.mesh import make_mesh, shard_batch_tree
    from titok_tpu.parallel.train_step import DPTrainStepBuilder

    cfg = tiny_config(**{
        "optimizer.name": "adafactor",
        "tokenizer.losses.disc_weight": 0.4,
    })
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

    def _n_devices_of(arr):
        return len({s.device.id for s in arr.addressable_shards})

    # the bf16 momentum mirrors the params, so large ones must be split
    n_split_opt = sum(
        _n_devices_of(leaf) > 1
        for leaf in jax.tree_util.tree_leaves(fsdp_state.gen_opt)
        if hasattr(leaf, "addressable_shards")
    )
    assert n_split_opt > 0

    fn = dp.make_train_step({})

    def pinned(s, b, d, p):
        ns, m, i = fn(s, b, d, p)
        return jax.lax.with_sharding_constraint(ns, shardings), m, i

    sharded_b = shard_batch_tree(stacked, mesh)
    sharded_d = shard_batch_tree(stacked_d, mesh)
    ref_state, _, ref_idx = jax.jit(fn, donate_argnums=())(
        state, sharded_b, sharded_d, None
    )
    new_state, _, idx = jax.jit(pinned, donate_argnums=())(
        fsdp_state, sharded_b, sharded_d, None
    )

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    for a, b in zip(jax.tree_util.tree_leaves(new_state.gen_params),
                    jax.tree_util.tree_leaves(ref_state.gen_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
        )
    for (path, leaf_in), leaf_out in zip(
        jax.tree_util.tree_flatten_with_path(fsdp_state.gen_opt)[0],
        jax.tree_util.tree_leaves(new_state.gen_opt),
    ):
        if hasattr(leaf_in, "addressable_shards") and _n_devices_of(leaf_in) > 1:
            assert _n_devices_of(leaf_out) > 1, path


def test_parallel_config_compositions():
    """Round 4: adafactor composes with TP (rank-aware factored-moment
    shardings, tests/test_dptp.py) — the config gate accepts it; FSDP
    still rejects CP/TP (those axes already shard the same bytes)."""
    from train import validate_parallel_config

    validate_parallel_config(tiny_config(**{
        "optimizer.name": "adafactor",
        "training.main.tp_devices": 2,
    }))
    validate_parallel_config(tiny_config(**{"training.main.tp_devices": 2}))
    validate_parallel_config(tiny_config(**{
        "optimizer.name": "adafactor",
        "training.main.train_devices": 4,
        "training.main.fsdp": True,
    }))
    with pytest.raises(ValueError, match="fsdp"):
        validate_parallel_config(tiny_config(**{
            "training.main.train_devices": 4,
            "training.main.fsdp": True,
            "training.main.tp_devices": 2,
        }))
