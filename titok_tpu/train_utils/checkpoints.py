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
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_interval: int = 1000,
                 keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if keep in (-1, None) else int(keep),
            save_interval_steps=int(save_interval),
            enable_async_checkpointing=True,
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def maybe_save(self, step: int, state: Any) -> bool:
        """Save if the interval policy wants this step. Non-blocking."""
        return self.mgr.save(int(step), args=ocp.args.StandardSave(state))

    def save(self, step: int, state: Any) -> bool:
        return self.mgr.save(
            int(step), args=ocp.args.StandardSave(state), force=True
        )

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
    raw = ckptr.restore(path)  # nested dicts, no template required
    report = {"loaded": 0, "missing": [], "unexpected": [], "mismatched": []}
    gen_params = _merge_by_key(
        state.gen_params, raw.get("gen_params", {}), "gen", report
    )
    disc_params = _merge_by_key(
        state.disc_params, raw.get("disc_params", {}), "disc", report
    )
    if verbose:
        msg = f"init_from_checkpoint: {report['loaded']} tensors loaded"
        for k in ("missing", "unexpected", "mismatched"):
            if report[k]:
                msg += f"; {len(report[k])} {k} (kept init): {report[k][:4]}"
        print(msg)
    return state.replace(gen_params=gen_params, disc_params=disc_params)
