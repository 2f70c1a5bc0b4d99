#!/usr/bin/env python
"""Run the slow test tier and append a dated run log to docs/slow_suite.log.

Every run is appended — pass or fail — so the log is an honest record; the
``exit:`` field distinguishes them (a pass entry shows ``exit: 0``).

VERDICT r3 weak #6: the slow-marked tests (multi-process XE/RL/CLI dryruns,
vision graphs, full-stack CLI) are the strongest correctness evidence in the
repo, but nothing in-repo recorded them passing.  This runner executes
``pytest -m slow`` (plus anything extra passed on the command line), captures
machine/commit/duration metadata, and appends a machine-readable entry to
``docs/slow_suite.log`` so every recorded run is auditable at its commit.

Usage:
    python scripts/run_slow_suite.py             # run + append log entry
    python scripts/run_slow_suite.py --dry-run   # run, print entry, no write
"""

import os
import platform
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "docs", "slow_suite.log")


_GIT_FAILED = "<git-unavailable>"


def _git(*args):
    try:
        return subprocess.run(["git", *args], cwd=REPO, check=True,
                              capture_output=True, text=True
                              ).stdout.strip()
    except Exception:
        return _GIT_FAILED


def _dirty_state():
    status = _git("status", "--porcelain")
    if status == _GIT_FAILED:
        return "dirty-state unknown"
    return "dirty" if status else "clean"


def main(argv):
    dry = "--dry-run" in argv
    extra = [a for a in argv if a != "--dry-run"]
    cmd = [sys.executable, "-m", "pytest", "tests/", "-m", "slow", "-q",
           "--durations=15", *extra]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    wall = time.perf_counter() - t0

    tail = (proc.stdout.strip().splitlines() or ["<no output>"])
    summary = tail[-1]
    durations = [ln for ln in tail if ln.lstrip().startswith(
        tuple("0123456789")) and "s call" in ln][:15]

    entry = [
        "=" * 72,
        f"date:     {datetime.now(timezone.utc).isoformat(timespec='seconds')}",
        f"commit:   {_git('rev-parse', 'HEAD')} ({_dirty_state()})",
        f"machine:  {platform.node()} / {platform.machine()} / "
        f"python {platform.python_version()}",
        f"command:  {' '.join(cmd[1:])}",
        f"wall:     {wall:.1f} s",
        f"exit:     {proc.returncode}",
        f"summary:  {summary}",
        "slowest:",
        *[f"  {d.strip()}" for d in durations],
    ]
    text = "\n".join(entry) + "\n"
    print(text)
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-2000:], file=sys.stderr)
    if not dry:
        os.makedirs(os.path.dirname(LOG), exist_ok=True)
        with open(LOG, "a") as f:
            f.write(text)
        print(f"appended to {LOG}")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
