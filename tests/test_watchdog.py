"""Unit drives for tools/watch_quality_run.py process-tree helpers.

No jax import — pure process plumbing, runs in ~2 s.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import watch_quality_run as w  # noqa: E402


def test_tree_pids_and_kill_tree(monkeypatch):
    p = subprocess.Popen(["bash", "-c", "sleep 60 & sleep 60 & wait"])
    # shrink kill_tree's TERM->KILL grace period for the test
    orig_sleep = time.sleep
    monkeypatch.setattr(w.time, "sleep", lambda s: orig_sleep(min(s, 0.5)))
    try:
        time.sleep(0.5)
        pids = w.tree_pids(p.pid)
        assert p.pid in pids and len(pids) >= 3
        assert w.tree_cpu_seconds(p.pid) >= 0.0
    finally:
        w.kill_tree(p.pid)
        p.wait()
    for q in w.tree_pids(p.pid):
        assert q == p.pid  # only the reaped root may linger as zombie


def test_tree_cpu_seconds_counts_busy_child():
    p = subprocess.Popen(
        [sys.executable, "-c",
         "import time\nt = time.time()\nwhile time.time() - t < 2: pass"])
    try:
        time.sleep(1.5)
        assert w.tree_cpu_seconds(p.pid) > 0.5
    finally:
        p.wait()


def test_relay_ok_maps_subprocess_outcomes(monkeypatch):
    """Probe semantics: rc 0 -> healthy; nonzero or timeout -> NOT healthy
    (and never an exception — a hung probe must not crash the watchdog)."""
    class R:
        def __init__(self, rc):
            self.returncode = rc

    monkeypatch.setattr(w.subprocess, "run", lambda *a, **k: R(0))
    assert w.relay_ok() is True
    monkeypatch.setattr(w.subprocess, "run", lambda *a, **k: R(1))
    assert w.relay_ok() is False

    def boom(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)
    monkeypatch.setattr(w.subprocess, "run", boom)
    assert w.relay_ok() is False
