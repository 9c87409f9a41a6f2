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


def restore_weights_only(path: str, state: Any) -> Any:
    """init_from_checkpoint mode: load gen (+disc if present) params from a
    checkpoint directory into an existing TrainState, keeping optimizer
    state and step fresh (ref ``train.py:265-267``, strict=False)."""
    path = os.path.abspath(path)
    # CheckpointManager writes items under <step>/default/
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
    loaded = ckptr.restore(path, abstract)
    return state.replace(
        gen_params=loaded.gen_params,
        disc_params=loaded.disc_params,
    )
