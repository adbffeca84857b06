"""Stall watchdog for long TPU campaigns.

The axon TPU tunnel occasionally stalls a pending RPC forever (0% CPU,
stale log — see CLAUDE.md). This wrapper launches a training CLI, watches
its log file, and when the log goes stale for longer than --stale-min it
kills the child's process group (by recorded PID — never by pattern) and
relaunches the command. The wrapped command must be resumable (e.g.
`src/train_stream.py --resume`, whose checkpoints/last.pt makes relaunch
idempotent).

Usage:
  python tools/stall_watchdog.py --log runs/X/metrics.jsonl --stale-min 6 \
      -- python src/train_stream.py --run_dir runs/X ... --resume

Exits with the child's exit code once it terminates on its own with 0, or
after --max-relaunches consecutive stall kills / nonzero exits.
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def log_age(path: str) -> float:
    try:
        return time.time() - os.stat(path).st_mtime
    except OSError:
        return 0.0  # not created yet: the child is still starting up


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True,
                    help="file whose mtime proves the child is alive")
    ap.add_argument("--stale-min", type=float, default=6.0)
    ap.add_argument("--poll-sec", type=float, default=30.0)
    ap.add_argument("--max-relaunches", type=int, default=20)
    ap.add_argument("--max-crashloops", type=int, default=3,
                    help="abort after this many CONSECUTIVE nonzero exits "
                         "(a deterministic failure, e.g. a compile OOM, "
                         "won't fix itself — stall kills don't count)")
    ap.add_argument("--grace-min", type=float, default=20.0,
                    help="startup grace before the first staleness check "
                         "(pool build + cold compile can take >10 min)")
    ap.add_argument("--deadline-min", type=float, default=0.0,
                    help="wall-clock time box: past this, kill the child "
                         "and exit 0 (a clean stage end — the wrapped "
                         "trainer checkpoints every val, so a later "
                         "--resume continues; lets a campaign guarantee "
                         "its eval stages run inside a fixed budget)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to run")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (pass it after --)")

    relaunches = 0
    crashloops = 0
    t0 = time.time()
    while True:
        start = time.time()
        # new process group so a stalled child's threads die with it
        child = subprocess.Popen(cmd, start_new_session=True)
        print(f"[watchdog] launched pid={child.pid}: {' '.join(cmd)}",
              flush=True)
        stalled = False
        while True:
            try:
                rc = child.wait(timeout=args.poll_sec)
                break
            except subprocess.TimeoutExpired:
                pass
            if (args.deadline_min
                    and time.time() - t0 > args.deadline_min * 60):
                print(f"[watchdog] deadline {args.deadline_min:.0f} min "
                      f"reached — stopping pid={child.pid} (stage ends "
                      f"clean; resume continues from the last checkpoint)",
                      flush=True)
                os.killpg(child.pid, signal.SIGKILL)
                child.wait()
                return 0
            in_grace = time.time() - start < args.grace_min * 60
            if not in_grace and log_age(args.log) > args.stale_min * 60:
                print(f"[watchdog] log stale "
                      f"{log_age(args.log) / 60:.1f} min — killing "
                      f"pid={child.pid}", flush=True)
                os.killpg(child.pid, signal.SIGKILL)
                child.wait()
                rc = None
                stalled = True
                break
        if not stalled and rc == 0:
            print("[watchdog] child finished cleanly", flush=True)
            return 0
        if stalled:
            crashloops = 0   # tunnel stall: relaunching genuinely helps
        else:
            crashloops += 1
            if crashloops >= args.max_crashloops:
                print(f"[watchdog] {crashloops} consecutive crashes "
                      f"(last rc={rc}) — deterministic failure, aborting",
                      flush=True)
                return rc if isinstance(rc, int) and rc else 1
        relaunches += 1
        if relaunches > args.max_relaunches:
            print(f"[watchdog] giving up after {relaunches} relaunches "
                  f"(last rc={rc})", flush=True)
            return rc if isinstance(rc, int) and rc else 1
        print(f"[watchdog] relaunch {relaunches} (rc={rc})", flush=True)
        time.sleep(5)


if __name__ == "__main__":
    sys.exit(main())
