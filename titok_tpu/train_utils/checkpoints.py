"""Orbax checkpointing with the reference's two load modes.

Mirrors reference semantics (``train.py:239-248,265-267,282-286``):

- periodic save every ``save_interval`` steps keeping the ``keep_prior``
  most recent (the reference ranks by step via a monitor trick);
- ``resume_from_checkpoint``: full trainer state (params, both optimizer
  states, step, rng);
- ``init_from_checkpoint``: generator weights only, tolerant of missing
  keys (the reference loads with ``strict=False``);
- frozen metric nets (LPIPS) are never part of the saved state
  (the reference filters them out of ``state_dict``, ``train.py:218-220``) —
  here they simply live outside TrainState.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_interval: int = 1000,
                 keep: int = 2):
        self.directory = os.path.abspath(directory)
        self.save_interval = int(save_interval)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if keep in (-1, None) else int(keep),
            # interval <= 0 means "periodic saves off" (smoke/bench runs);
            # orbax's interval policy computes step % interval and a 0
            # crashes the first maybe_save with ZeroDivisionError — the
            # crash-restart loop behind the r3f ">8 s/step" window
            save_interval_steps=max(int(save_interval), 1),
            enable_async_checkpointing=True,
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)
        self.snapshot_dir = os.path.join(self.directory, "host_snapshot")

    def maybe_save(self, step: int, state: Any) -> bool:
        """Save if the interval policy wants this step. Non-blocking."""
        if self.save_interval <= 0:
            return False
        return self.mgr.save(int(step), args=ocp.args.StandardSave(state))

    def save(self, step: int, state: Any) -> bool:
        step = int(step)
        # orbax raises StepAlreadyExistsError even with force=True; hit by
        # the final/preemption save when relaunching an already-completed
        # run (the supervisor always resumes over an existing run dir),
        # which otherwise becomes a crash-restart loop.
        if step in self.mgr.all_steps():
            return False
        return self.mgr.save(step, args=ocp.args.StandardSave(state),
                             force=True)

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        """Restore the full TrainState (resume mode)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_template)
        return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()

    # -- host-side snapshots (bounded wedge-loss window) --------------------
    # The tunneled TPU relay can wedge with all device calls hanging
    # (CLAUDE.md): a SIGTERM preemption save then blocks on the device
    # fetch and the run loses ``save_interval`` + the wedge. A *host*
    # snapshot is written from an already-fetched numpy state, so it can
    # neither hang nor be lost with the process — resume takes the newest
    # of (periodic checkpoint, snapshot).

    def save_snapshot(self, step: int, host_state: Any) -> None:
        """Synchronously persist an already-on-host state tree; keeps only
        the newest snapshot. Independent of the async manager (which may be
        mid-write or hung on a wedged device)."""
        os.makedirs(self.snapshot_dir, exist_ok=True)
        path = os.path.join(self.snapshot_dir, str(int(step)))
        if os.path.exists(path):
            return
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, host_state)
        ckptr.wait_until_finished()
        ckptr.close()
        for name in os.listdir(self.snapshot_dir):
            if name.isdigit() and int(name) != int(step):
                shutil.rmtree(os.path.join(self.snapshot_dir, name),
                              ignore_errors=True)

    def latest_snapshot_step(self) -> int | None:
        if not os.path.isdir(self.snapshot_dir):
            return None
        steps = [int(n) for n in os.listdir(self.snapshot_dir) if n.isdigit()]
        return max(steps) if steps else None

    def restore_newest(self, state_template: Any) -> Any:
        """Resume from whichever is newer: the manager's latest periodic /
        preemption checkpoint or the latest host snapshot."""
        ckpt_step = self.latest_step()
        snap_step = self.latest_snapshot_step()
        if ckpt_step is None and snap_step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        if snap_step is not None and (ckpt_step is None
                                      or snap_step > ckpt_step):
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, state_template
            )
            ckptr = ocp.StandardCheckpointer()
            out = ckptr.restore(
                os.path.join(self.snapshot_dir, str(snap_step)), abstract
            )
            ckptr.close()
            print(f"restored host snapshot at step {snap_step} "
                  f"(newer than checkpoint {ckpt_step})")
            return out
        return self.restore(state_template, ckpt_step)


def restore_raw(ckptr: "ocp.StandardCheckpointer", path: str) -> Any:
    """Template-free restore that also works across platforms.

    A bare ``ckptr.restore(path)`` replays the shardings recorded at save
    time, which fails when the checkpoint was written on different
    hardware (e.g. scoring a TPU-trained checkpoint on CPU). Fall back to
    building an abstract template from the checkpoint's own metadata with
    a concrete local single-device sharding.
    """
    try:
        return ckptr.restore(path)
    except Exception:
        md = ckptr.metadata(path).item_metadata
        sh = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh), md
        )
        return ckptr.restore(path, abstract)


def _merge_by_key(dst: Any, src: Any, prefix: str, report: dict) -> Any:
    """Torch ``load_state_dict(strict=False)`` semantics over nested dicts:
    keys present in both (with matching leaf shapes) come from ``src``;
    keys missing from ``src`` (or shape-mismatched) keep ``dst`` and are
    reported; extra ``src`` keys are ignored."""
    if isinstance(dst, dict):
        out = {}
        src_d = src if isinstance(src, dict) else {}
        for k, v in dst.items():
            if k in src_d:
                out[k] = _merge_by_key(v, src_d[k], f"{prefix}/{k}", report)
            else:
                report["missing"].append(f"{prefix}/{k}")
                out[k] = v
        for k in src_d:
            if k not in dst:
                report["unexpected"].append(f"{prefix}/{k}")
        return out
    # leaf
    if hasattr(src, "shape") and hasattr(dst, "shape") and \
            tuple(src.shape) == tuple(dst.shape):
        report["loaded"] += 1
        import jax.numpy as jnp

        return jnp.asarray(src, dst.dtype)
    report["mismatched"].append(prefix)
    return dst


def restore_weights_only(path: str, state: Any, verbose: bool = True) -> Any:
    """init_from_checkpoint mode: load gen (+disc if present) params from a
    checkpoint directory into an existing TrainState, keeping optimizer
    state and step fresh.

    Tolerant like the reference's ``strict=False`` load
    (``/root/reference/train.py:265-267``): the checkpoint is restored
    *without* a structure template and intersected by key — a disc-off
    checkpoint loads cleanly into a disc-on state (and vice versa), missing
    and shape-mismatched keys keep their fresh initialization.
    """
    path = os.path.abspath(path)
    # CheckpointManager writes items under <step>/default/
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    ckptr = ocp.StandardCheckpointer()
    raw = restore_raw(ckptr, path)  # nested dicts, no template required
    report = {"loaded": 0, "missing": [], "unexpected": [], "mismatched": []}
    gen_params = _merge_by_key(
        state.gen_params, raw.get("gen_params", {}), "gen", report
    )
    disc_params = _merge_by_key(
        state.disc_params, raw.get("disc_params", {}), "disc", report
    )
    # EMA-VQ family: the trained codebook is paired with the encoder
    # weights — initializing one without the other glues the encoder to a
    # random codebook (reference analog: the quantizer buffers travel in
    # state_dict, /root/reference/train.py:265-267)
    vq_state = state.vq_state
    raw_vq = raw.get("vq_state") if isinstance(raw, dict) else None
    if raw_vq and vq_state is not None and not isinstance(vq_state, tuple):
        import numpy as np

        cb = np.asarray(raw_vq["codebook"], np.float32)
        if cb.shape == tuple(vq_state.codebook.shape):
            vq_state = type(vq_state)(
                codebook=cb,
                ema_counts=np.asarray(raw_vq["ema_counts"], np.float32),
                ema_sums=np.asarray(raw_vq["ema_sums"], np.float32),
                # pre-age-tracking checkpoints lack ages
                ages=np.asarray(
                    raw_vq.get("ages", np.zeros(cb.shape[0])), np.float32),
            )
            report["loaded"] += 4
        else:
            report["mismatched"].append("vq_state.codebook")
    if verbose:
        msg = f"init_from_checkpoint: {report['loaded']} tensors loaded"
        for k in ("missing", "unexpected", "mismatched"):
            if report[k]:
                msg += f"; {len(report[k])} {k} (kept init): {report[k][:4]}"
        print(msg)
    return state.replace(gen_params=gen_params, disc_params=disc_params,
                         vq_state=vq_state)
