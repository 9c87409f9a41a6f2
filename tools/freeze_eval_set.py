"""Freeze the held-out eval set as a versioned, committed artifact.

Round-3 verdict weak #4: corpus churn between rounds silently broke
round-over-round quality comparability (the generator gained content
layers, the old corpus was wiped, and "deterministic by seed" was not
enough once the seed recipe itself was ambiguous). The fix is to treat
the EVAL SET as a frozen artifact: the shards live in the repo
(docs/eval_set/), every clip's sha256 is recorded in MANIFEST.json, and
this tool verifies a regenerated or staged corpus against it.

Usage:
    # freeze (once): copy shards + write manifest
    python tools/freeze_eval_set.py freeze .scratch/wds/eval docs/eval_set

    # verify a local eval corpus byte-matches the frozen one
    python tools/freeze_eval_set.py verify .scratch/wds/eval docs/eval_set
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tarfile


def _sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()


def _member_hashes(shard: str) -> dict:
    out = {}
    with tarfile.open(shard) as tf:
        for m in tf.getmembers():
            if not m.isfile():
                continue
            out[m.name] = hashlib.sha256(
                tf.extractfile(m).read()).hexdigest()
    return out


def freeze(src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    shards = sorted(p for p in os.listdir(src_dir) if p.endswith(".tar"))
    if not shards:
        sys.exit(f"no .tar shards in {src_dir}")
    manifest = {"shards": {}, "clips": {}}
    total = 0
    for s in shards:
        src = os.path.join(src_dir, s)
        shutil.copy2(src, os.path.join(dst_dir, s))
        manifest["shards"][s] = _sha(src)
        manifest["clips"].update(
            {f"{s}::{k}": v for k, v in _member_hashes(src).items()})
        total += os.path.getsize(src)
    with open(os.path.join(dst_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"froze {len(shards)} shards ({total / 1e6:.1f} MB), "
          f"{len(manifest['clips'])} members -> {dst_dir}")


def verify(src_dir: str, frozen_dir: str) -> None:
    with open(os.path.join(frozen_dir, "MANIFEST.json")) as f:
        manifest = json.load(f)
    ok = True
    for s, want in manifest["shards"].items():
        p = os.path.join(src_dir, s)
        if not os.path.exists(p):
            print(f"MISSING {s}")
            ok = False
            continue
        got = _sha(p)
        if got != want:
            # shard-level mismatch can be benign tar metadata (mtimes);
            # fall back to member-level comparison
            members = _member_hashes(p)
            frozen = {k.split("::", 1)[1]: v
                      for k, v in manifest["clips"].items()
                      if k.startswith(s + "::")}
            if members == frozen:
                print(f"{s}: tar bytes differ but all members match "
                      "(metadata-only drift)")
            else:
                bad = [k for k in frozen
                       if members.get(k) != frozen[k]]
                extra = sorted(set(members) - set(frozen))
                parts = [f"{len(bad)} members differ (e.g. {bad[:3]})"]
                if extra:
                    parts.append(
                        f"{len(extra)} extra/renamed (e.g. {extra[:3]})")
                print(f"MISMATCH {s}: " + "; ".join(parts))
                ok = False
    print("OK" if ok else "FAILED")
    if not ok:
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["freeze", "verify"])
    ap.add_argument("src_dir")
    ap.add_argument("frozen_dir")
    args = ap.parse_args()
    (freeze if args.mode == "freeze" else verify)(args.src_dir,
                                                  args.frozen_dir)


if __name__ == "__main__":
    main()
