"""Persistent XLA compilation cache across process restarts.

Long runs on leaky/virtualized device runtimes operate by recycling the
training process (``tools/train_supervised.py``); each restart otherwise
pays the full trace+compile cost again — on the tunneled TPU relay the
first post-restart eval epoch alone costs ~15 min of remote compiles.
JAX's persistent compilation cache keys serialized executables by
(computation fingerprint, compile options, backend version), so a
recycled process with identical shapes hits the disk cache instead.

The reference has no equivalent (torch.compile caches are in-memory per
process; reference ``train.py:38-39``).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "~/.cache/titok_tpu/xla_cache"


def setup_compilation_cache(config=None, force: bool = False) -> str | None:
    """Enable JAX's persistent compilation cache.

    Config key ``training.main.compilation_cache_dir``: unset -> default
    path; explicit empty string / ``false`` -> disabled. Safe to call
    multiple times. Returns the cache dir in use (or None if disabled).

    On CPU backends the cache is skipped unless ``force`` (tests): XLA:CPU
    AOT *reloads* are brittle across host-feature fingerprints and CPU
    compiles are cheap — the cache exists for the remote-compile relay.
    """
    path = DEFAULT_CACHE_DIR
    if config is not None:
        raw = config.training.main.get("compilation_cache_dir", DEFAULT_CACHE_DIR)
        if raw is None:
            raw = DEFAULT_CACHE_DIR
        if raw is False or str(raw).strip().lower() in ("", "false", "none", "0"):
            return None
        path = str(raw)
    path = os.path.expanduser(path)
    try:
        import jax

        if (not force
                and str(jax.config.jax_platforms or "").startswith("cpu")):
            # the cache exists for the remote-compile relay; XLA:CPU AOT
            # reloads are brittle (host machine-feature mismatch errors)
            # and CPU compiles are cheap — skip it there
            return None
        os.makedirs(path, exist_ok=True)

        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: on the relay even small programs compile
        # remotely, and restarts replay the exact same set
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001 - cache is an optimization only
        print(f"[compile-cache] disabled ({e})")
        return None
    return path
