"""Cleanly stop a tools/watch_quality_run.py supervised quality run.

Kills the watchdog first (so it cannot relaunch), then the driver's
process tree by explicit pid walk — never by name pattern.  Per-cell
crash-resume (`cell_done` / `evalnet_done`) makes the stop lossless up to
the in-flight cell: relaunching the watchdog later resumes where it left
off.  Use before handing the TPU to bench.py or at session end.

Usage: python tools/stop_quality_run.py [watchdog_pid]
(default: read /tmp/watchdog.pid)
"""

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from watch_quality_run import child_pids, kill_tree  # noqa: E402


def main() -> int:
    if len(sys.argv) > 1:
        wd = int(sys.argv[1])
    else:
        try:
            with open("/tmp/watchdog.pid") as f:
                wd = int(f.read().split()[0])
        except (OSError, ValueError, IndexError):
            print("no watchdog pid (arg or /tmp/watchdog.pid)")
            return 1
    drivers = child_pids(wd)
    try:
        os.kill(wd, signal.SIGTERM)
        print(f"watchdog {wd} terminated")
    except ProcessLookupError:
        print(f"watchdog {wd} already gone")
    time.sleep(2)
    for d in drivers:
        kill_tree(d)
        print(f"driver tree {d} killed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
