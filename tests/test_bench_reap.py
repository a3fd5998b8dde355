"""Tests for ctdd_tpu.utils.reap — bench.py's pre-measurement job reaper.

Host-side only (no TPU): spawns throwaway processes, points pid-files at
them, and checks the reaper's pid-reuse guard, skip-list, and subtree kill.
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

from ctdd_tpu.utils.reap import reap_orchestrated_jobs


def _alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def test_reaps_matching_job_and_its_children(tmp_path):
    # A fake queue shell (cmdline contains "queue_r3") with a sleeping child.
    script = tmp_path / "fake_queue_r3_test.sh"
    script.write_text("#!/bin/bash\nsleep 300 &\nwait\n")
    script.chmod(0o755)
    proc = subprocess.Popen(["bash", str(script)])
    time.sleep(0.3)
    (tmp_path / "queue.pid").write_text(str(proc.pid))
    try:
        killed = reap_orchestrated_jobs(str(tmp_path / "*.pid"),
                                        verbose=False)
        assert proc.pid in killed
        assert len(killed) >= 2  # the shell and its sleep child
        time.sleep(0.2)
        assert not _alive(proc.pid) or proc.poll() is not None
    finally:
        proc.kill()
        proc.wait()


def test_pid_reuse_guard_skips_unrelated_process(tmp_path):
    # cmdline has none of our job tags -> must be left alone.
    proc = subprocess.Popen([sys.executable, "-c",
                             "import time; time.sleep(300)"])
    time.sleep(0.2)
    (tmp_path / "flagship.pid").write_text(str(proc.pid))
    try:
        killed = reap_orchestrated_jobs(str(tmp_path / "*.pid"),
                                        verbose=False)
        assert proc.pid not in killed
        assert proc.poll() is None
    finally:
        proc.kill()
        proc.wait()


def test_skip_list_and_stale_pidfiles(tmp_path):
    # deadman.pid / harvest.pid are never touched even if they match; stale
    # or garbage pid-files are ignored without raising.
    proc = subprocess.Popen(["bash", "-c", "sleep 300"])  # no matching tag
    time.sleep(0.2)
    (tmp_path / "deadman.pid").write_text(str(proc.pid))
    (tmp_path / "stale.pid").write_text("999999999")
    (tmp_path / "garbage.pid").write_text("not-a-pid")
    try:
        killed = reap_orchestrated_jobs(str(tmp_path / "*.pid"),
                                        verbose=False)
        assert killed == []
        assert proc.poll() is None
    finally:
        proc.kill()
        proc.wait()


def test_no_reap_env_disables(tmp_path, monkeypatch):
    monkeypatch.setenv("CTDD_BENCH_NO_REAP", "1")
    script = tmp_path / "fake_queue_r3_test.sh"
    script.write_text("#!/bin/bash\nsleep 300\n")
    script.chmod(0o755)
    proc = subprocess.Popen(["bash", str(script)])
    time.sleep(0.2)
    (tmp_path / "queue.pid").write_text(str(proc.pid))
    try:
        assert reap_orchestrated_jobs(str(tmp_path / "*.pid"),
                                      verbose=False) == []
        assert proc.poll() is None
    finally:
        proc.kill()
        proc.wait()
