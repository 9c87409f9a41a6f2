"""Extract a durable weights-only artifact from a full training checkpoint.

A full TrainState checkpoint carries both optimizer towers' moments —
~4x the bytes of the weights for AdamW. For archival (committing a
trained model into git so it survives environment wipes) only
``gen_params`` / ``disc_params`` / ``vq_state`` matter: that is exactly
the subtree ``restore_weights_only`` (titok_tpu/train_utils/checkpoints.py)
intersects on, so the artifact plugs straight into
``general.checkpoints.init_from_checkpoint``, ``tools/evaluate.py``,
``tools/tokenize.py`` and ``tools/export_model.py``.

Reference analog: Lightning's ``save_weights_only`` flag — the reference
always saves full checkpoints (``/root/reference/train.py:218-225``);
this tool is the slim-artifact path it lacks.

Usage:
    python tools/save_weights.py <ckpt_step_dir> <out_dir> [--no-disc]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pure host work (read ckpt -> numpy -> write ckpt): never touch the TPU
# relay, and don't let the axon sitecustomize force it either
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="checkpoint step dir (orbax)")
    ap.add_argument("out", help="output dir for the weights-only artifact")
    ap.add_argument("--no-disc", action="store_true",
                    help="drop discriminator params (serving-only artifact)")
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="f32",
                    help="bf16 halves the artifact; restore_weights_only "
                         "casts leaves back to the state dtype on load")
    args = ap.parse_args()

    import numpy as np
    import orbax.checkpoint as ocp

    from titok_tpu.train_utils.checkpoints import restore_raw

    src = os.path.abspath(args.src)
    if os.path.isdir(os.path.join(src, "default")):
        src = os.path.join(src, "default")
    ckptr = ocp.StandardCheckpointer()
    raw = restore_raw(ckptr, src)
    keep = {}
    for key in ("gen_params", "disc_params", "vq_state"):
        if args.no_disc and key == "disc_params":
            continue
        val = raw.get(key) if isinstance(raw, dict) else None
        if val:
            keep[key] = val
    if "gen_params" not in keep:
        raise SystemExit(f"no gen_params found under {src}")
    step = raw.get("step") if isinstance(raw, dict) else None
    if step is not None:
        keep["step"] = step

    out = os.path.abspath(args.out)
    # numpy leaves -> the artifact carries no device shardings and
    # restores on any platform/topology (the training checkpoint it came
    # from is pinned to the devices it was saved on)
    import jax

    if args.dtype == "bf16":
        import jax.numpy as jnp

        def cast(x):
            a = np.asarray(x)
            if a.dtype == np.float32:
                return np.asarray(jnp.asarray(a, jnp.bfloat16))
            return a

        keep = jax.tree_util.tree_map(cast, keep)
    keep = jax.tree_util.tree_map(np.asarray, keep)
    ckptr.save(out, keep, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    total = 0
    for root, _, files in os.walk(out):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    print(f"saved weights-only artifact: {out} "
          f"({total / 1e6:.1f} MB, keys: {sorted(keep)})")


if __name__ == "__main__":
    main()
