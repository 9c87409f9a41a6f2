"""Supervised training: auto-restarting train.py with elastic recovery.

The reference has no failure detection or recovery at all (SURVEY.md §5);
a crashed or OOM-killed run just loses everything since the last periodic
checkpoint. This supervisor wraps the training CLI with both:

- **failure recovery**: if the child dies unexpectedly (crash, OOM kill),
  it is relaunched with ``resume_from_checkpoint=true`` and continues from
  the last checkpoint;
- **proactive memory-bound restart**: when the child's RSS crosses
  ``--rss-limit-gb``, the supervisor sends SIGTERM — the trainer's
  preemption handler (``training/trainer.py:_install_preemption_save``)
  checkpoints *the current step* and exits 143 — then relaunches with
  resume, losing zero steps. This matters on hosts where some runtime
  layer leaks per-step (e.g. a relay/virtualized device client pinning
  every H2D buffer): a multi-day run survives by recycling the process.

Usage (same CLI surface as train.py, plus supervisor flags):

    python tools/train_supervised.py config=configs/tiny.yaml \
        [dotted.overrides=...] [--rss-limit-gb 80] [--poll-sec 20] \
        [--max-restarts 50]

Exit code is the child's final exit code (0 = trained to max_steps).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time


def _rss_gb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 0.0


def resolve_save_path(child_args: list[str]) -> str:
    """The run's checkpoint dir, resolved the same way train.py will:
    YAML ``config=`` first, then dotted CLI overrides."""
    save_path = "out_ckpt"
    for a in child_args:
        if a.startswith("config="):
            try:
                import yaml

                with open(a.split("=", 1)[1]) as f:
                    cfg = yaml.safe_load(f)
                save_path = (cfg.get("general", {}).get("checkpoints", {})
                             .get("save_path")) or save_path
            except Exception as e:  # noqa: BLE001 - best effort, CLI may override
                print(f"[supervisor] could not read save_path from config: {e}",
                      flush=True)
    for a in child_args:
        if a.startswith("general.checkpoints.save_path="):
            save_path = a.split("=", 1)[1]
    return save_path


def launch_args(child_args: list[str], have_ckpt: bool) -> list[str]:
    """Child argv: resume whenever the run dir already has a checkpoint —
    also on the supervisor's FIRST launch. A supervisor (re)started over an
    existing run dir must continue that run, not train a fresh model over
    its checkpoints. init_from_checkpoint is cleared on resume — the
    weights were already loaded in the run's first life, and the trainer
    rejects resume+init together."""
    if not have_ckpt:
        return list(child_args)
    return [*child_args,
            "general.checkpoints.resume_from_checkpoint=true",
            "general.checkpoints.init_from_checkpoint=null"]


def main(argv: list[str]) -> int:
    rss_limit = 80.0
    poll_sec = 20.0
    max_restarts = 50
    # consecutive fast non-zero exits before giving up: a child that dies
    # within seconds of launch (bad override, missing weights, unreadable
    # dataset) fails deterministically — relaunching is a crash loop, not
    # recovery. Long-lived children and planned recycles reset the count.
    fast_fail_limit = 3
    fast_fail_sec = 120.0
    # don't enforce the RSS limit until the child has had time to reach
    # the training loop: before that the preemption handler isn't
    # installed yet and SIGTERM would kill without a save
    min_lifetime = 180.0
    child_args = []
    it = iter(argv)
    for a in it:
        if a == "--rss-limit-gb":
            rss_limit = float(next(it))
        elif a == "--poll-sec":
            poll_sec = float(next(it))
        elif a == "--max-restarts":
            max_restarts = int(next(it))
        elif a == "--min-lifetime-sec":
            min_lifetime = float(next(it))
        elif a == "--fast-fail-limit":
            fast_fail_limit = int(next(it))
        else:
            child_args.append(a)

    # Parsing only the CLI here once sent a crashed child back to step 0
    # because the YAML's save_path was checked against the wrong directory.
    save_path = resolve_save_path(child_args)

    def have_checkpoint() -> bool:
        try:
            if any(d.isdigit() for d in os.listdir(save_path)):
                return True
            # host snapshots count too (written when the device wedges and
            # the SIGTERM save can't finish; see CheckpointManager)
            snap = os.path.join(save_path, "host_snapshot")
            return any(d.isdigit() for d in os.listdir(snap))
        except OSError:
            return False

    train_py = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "train.py"
    )

    # Killing the SUPERVISOR must not orphan the trainer: a later
    # supervisor over the same run dir would launch a second trainer
    # against the same checkpoints (and a second heavy job on this box).
    # Forward SIGTERM so the child preemption-saves, then exit without
    # relaunching; the SIGKILL grace escalation below still applies.
    sup = {"child": None, "shutdown": False, "term_at": None}

    def _on_signal(sig, frame):
        sup["shutdown"] = True
        c = sup["child"]
        print(f"[supervisor] received signal {sig} — forwarding SIGTERM to "
              "the child and exiting once it stops", flush=True)
        if c is not None and c.poll() is None:
            c.send_signal(signal.SIGTERM)
            if sup["term_at"] is None:
                sup["term_at"] = time.time()

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    restarts = 0
    fast_fails = 0
    while True:
        args = [sys.executable, train_py,
                *launch_args(child_args, have_checkpoint())]
        print(f"[supervisor] launch (restart {restarts}): {' '.join(args[2:])}",
              flush=True)
        child = subprocess.Popen(args)
        sup["child"], sup["term_at"] = child, None
        t_start = time.time()
        # If the preemption save hangs (e.g. the device relay wedges
        # mid-checkpoint), escalate to SIGKILL after a grace period so
        # the leaked RSS cannot grow until the host OOM-kills something;
        # the relaunch resumes from the last periodic checkpoint.
        term_grace = 600.0
        while True:
            rc = child.poll()
            if rc is not None:
                break
            rss = _rss_gb(child.pid)
            if (rss > rss_limit and sup["term_at"] is None
                    and not sup["shutdown"]
                    and time.time() - t_start > min_lifetime):
                print(f"[supervisor] RSS {rss:.1f} GB > {rss_limit} GB — "
                      "SIGTERM for checkpoint-and-restart", flush=True)
                child.send_signal(signal.SIGTERM)
                sup["term_at"] = time.time()
            elif (sup["term_at"] is not None
                    and time.time() - sup["term_at"] > term_grace):
                print(f"[supervisor] child ignored SIGTERM for "
                      f"{term_grace:.0f}s (wedged save?) — SIGKILL",
                      flush=True)
                child.kill()
                sup["term_at"] = None
            time.sleep(poll_sec)

        if sup["shutdown"]:
            print(f"[supervisor] shutdown requested — child exited rc={rc}, "
                  "not relaunching", flush=True)
            return rc if rc is not None else 143
        if rc == 0:
            print("[supervisor] child completed", flush=True)
            return 0
        lifetime = time.time() - t_start
        if rc != 143 and lifetime < fast_fail_sec:
            fast_fails += 1
            if fast_fails >= fast_fail_limit:
                print(f"[supervisor] {fast_fails} consecutive exits with "
                      f"rc={rc} within {fast_fail_sec:.0f}s — deterministic "
                      "failure, NOT relaunching (fix the config/launch args)",
                      flush=True)
                return rc
        else:
            fast_fails = 0
        restarts += 1
        if restarts > max_restarts:
            print(f"[supervisor] giving up after {restarts} restarts "
                  f"(last rc={rc})", flush=True)
            return rc
        kind = "planned (preemption save)" if rc == 143 else f"unexpected rc={rc}"
        print(f"[supervisor] child exited — {kind}; resuming", flush=True)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
