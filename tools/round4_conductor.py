"""Round-4 unattended post-run chain (survives operator-session loss).

The binary 9-strategy quality run (watchdog pid in /tmp/watchdog.pid)
owns the single TPU chip and the single host core until it completes
(CLAUDE.md: never run the CPU suite concurrently with a TPU pipeline
run).  The remaining round-4 deliverables are serialized behind it:

  1. full CPU test suite green + recorded count   (VERDICT r3 next-#3)
  2. layout/perf sweep of the parked knobs        (VERDICT r3 next-#4)
     packedhead / denseinput / remat x dot1x1 (tools/bench_layout_variants)
  3. fresh bench.py line with the winning default
  4. multiclass (mIoU-arm) quality run on the SUIM-like proxy
     (VERDICT r3 next-#2) under its own self-healing watchdog

Each step logs to .r4_<step>.log in the repo root; the operator session
(whichever is alive) reads the logs and commits the docs.  The chain
runs detached:

    nohup python tools/round4_conductor.py > .r4_conductor.log 2>&1 &
    echo $! > /tmp/conductor.pid
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP_VARIANTS = [
    "dot1x1",                 # current default, re-anchor the baseline
    "packedhead",
    "dot1x1+packedhead",
    "dot1x1+denseinput",
    "dot1x1+packedhead+denseinput",
    "remat",
    "dot1x1+remat",
    "dot1x1+packedhead+denseinput+remat",
]


def note(msg):
    print(f"[conductor {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def wait_for(pidfile):
    try:
        pid = int(open(pidfile).read().strip())
    except (OSError, ValueError):
        note(f"no pid at {pidfile}; assuming that phase already finished")
        return
    note(f"waiting on pid {pid} ({pidfile})")
    while pid_alive(pid):
        time.sleep(60)
    note(f"pid {pid} exited")


def run(step, cmd, env=None, timeout=None):
    log = os.path.join(REPO, f".r4_{step}.log")
    note(f"step {step}: {' '.join(cmd)} -> {log}")
    t0 = time.time()
    with open(log, "ab", buffering=0) as f:
        f.write(f"== {time.strftime('%F %T')} {' '.join(cmd)}\n".encode())
        try:
            r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                               cwd=REPO, env=env, timeout=timeout)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
    note(f"step {step}: exit {rc} in {(time.time() - t0) / 60:.1f} min")
    return rc


def main():
    wait_for("/tmp/watchdog.pid")

    # 1. full CPU test suite (TPU and host are idle now)
    run("suite", [sys.executable, "-m", "pytest", "tests/", "-q",
                  "--durations=10"], timeout=3 * 3600)

    # 2. layout sweep on the real chip (one remote compile per variant)
    run("sweep", [sys.executable, "tools/bench_layout_variants.py",
                  *SWEEP_VARIANTS], timeout=3 * 3600)

    # 3. headline bench line with current defaults
    run("bench", [sys.executable, "bench.py"], timeout=3600)

    # 4. multiclass quality run under its own watchdog (detached enough:
    #    we are already a daemon; just exec it in the foreground so OUR
    #    pid file keeps meaning "round-4 chain still running").
    env = dict(os.environ,
               IM_WATCH_DRIVER=os.path.join("tools",
                                            "run_quality_multiclass.py"),
               IM_WATCH_LOG=".quality_mc_run.log",
               IM_GENS="0,1",
               PYTHONUNBUFFERED="1")
    rc = run("mc", [sys.executable, "tools/watch_quality_run.py",
                    "build", "04", "05", "10", "12", "13", "11", "collect"],
             env=env)
    note(f"chain complete (mc watchdog exit {rc})")


if __name__ == "__main__":
    main()
