"""Reap this repo's own orchestrated TPU jobs before a benchmark run.

The unattended round queues (scripts/queue_round3.sh, train_watchdog.sh)
track every long-running TPU job in a /tmp/<name>.pid file. When the driver
runs bench.py at round end, a trainer that is still mid-schedule would
time-share the single tunneled chip and corrupt the measurement (the
session deadman, scripts/session_deadman.sh, eventually kills it — but only
after its staleness threshold, which can be minutes after bench starts).

``reap_orchestrated_jobs`` closes that window: it SIGKILLs exactly the
processes recorded in our pid-files, parent first (a queue shell killed
after its child would just dispatch the next stage), then the captured
descendants. Two safety rules, in keeping with this box's no-pattern-kill
policy:

  * pids come ONLY from pid-files our own tooling wrote — never from
    scanning process names;
  * a pid is skipped unless its /proc cmdline still looks like one of our
    orchestrated jobs (guards against pid reuse after a stale file).

Disable with CTDD_BENCH_NO_REAP=1.
"""

from __future__ import annotations

import glob
import os
import signal
import time

# Substrings that identify our orchestrated jobs' command lines: the CLIs a
# queue dispatches plus the queue/watchdog/collector shells themselves.
_OURS = (
    "train.py", "eval.py", "fid_stats.py", "fid_trajectory.py",
    "maze_sweep.py", "pytest", "queue_r3", "queue_round", "watchdog",
    "snapcol", "snapshot_collector",
)

# Pid-files that must NOT be reaped: the session deadman (harmless, and it
# only acts on already-dead heartbeats) and the evidence harvester (pure
# file copier; killing it would stop final log mirroring).
_SKIP_BASENAMES = ("deadman.pid", "harvest.pid")


def _cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return ""


def _descendants(pid: int) -> list[int]:
    """All /proc descendants of pid, parents before children."""
    kids: dict[int, list[int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
        except (OSError, IndexError, ValueError):
            continue
        kids.setdefault(ppid, []).append(int(p))
    out, frontier = [], [pid]
    while frontier:
        nxt = []
        for q in frontier:
            for c in kids.get(q, []):
                out.append(c)
                nxt.append(c)
        frontier = nxt
    return out


def reap_orchestrated_jobs(pidfile_glob: str = "/tmp/*.pid",
                           verbose: bool = True) -> list[int]:
    """Kill our orchestrated jobs recorded under ``pidfile_glob``.

    Returns the list of pids actually killed. Respects CTDD_BENCH_NO_REAP.
    """
    if os.environ.get("CTDD_BENCH_NO_REAP"):
        return []
    me = os.getpid()
    killed: list[int] = []
    for pf in sorted(glob.glob(pidfile_glob)):
        if os.path.basename(pf) in _SKIP_BASENAMES:
            continue
        try:
            pid = int(open(pf).read().split()[0])
        except (OSError, ValueError, IndexError):
            continue
        if pid in (me, 0, 1):
            continue
        cmd = _cmdline(pid)
        if not cmd or not any(tag in cmd for tag in _OURS):
            continue  # dead, or the pid was reused by something else
        subtree = _descendants(pid)
        if me in subtree or pid == os.getppid():
            continue  # never saw our own ancestry through a stale file
        for target in [pid] + subtree:  # parent first: shells respawn stages
            try:
                os.kill(target, signal.SIGKILL)
                killed.append(target)
            except OSError:
                pass
        if verbose:
            print(f"reap: killed {pid} (+{len(subtree)} descendants) "
                  f"from {pf}: {cmd[:80]}", flush=True)
    if killed:
        time.sleep(3.0)  # let the TPU client teardown settle
    return killed
