"""Round-4 unattended post-run chain (survives operator-session loss).

The binary 9-strategy quality run (watchdog pid in /tmp/watchdog.pid)
owns the single TPU chip and the single host core until it completes
(CLAUDE.md: never run the CPU suite concurrently with a TPU pipeline
run).  The remaining round-4 deliverables are serialized behind it:

  1. full CPU test suite green + recorded count   (VERDICT r3 next-#3)
  2. layout/perf sweep of the parked knobs        (VERDICT r3 next-#4)
     packedhead / denseinput / remat x dot1x1 (tools/bench_layout_variants)
  3. BN-fold bound measurement                    (VERDICT r3 weak-#6)
  4. fresh bench.py line with the current defaults
  5. multiclass (mIoU-arm) quality run, gens 0-1  (VERDICT r3 next-#2)
  6. gens 3-4 extension of the strategies whose gens 0-2 artifacts
     SURVIVE on disk — AIM++ (14) and AIM+ (13)   (VERDICT r3 next-#5a)
     (IM/IM+/IM++ run-1/2 checkpoints were lost to the VM wipes; their
     gens 0-2 numbers are recorded in QUALITY_r3.md + the supplement
     CSVs, and re-training ~27 cells from scratch is not worth the chip
     hours this round)
  7. runid-2 replication of the flagship AIM++    (VERDICT r3 next-#5b)
     03/04 train runid-2 seeds, then 14 (IM_RUNIDS=2: runid-1 cells
     are untouched; IM++ replication would re-train its wiped runid-1
     tree first, so the flagship stands in for the top-2 pair)

Steps 5-7 run under their own self-healing watchdogs; whichever the
round's wall clock cuts off resumes next round via cell_done.  Each
step logs to .r4_<step>.log in the repo root; the operator session
(whichever is alive) reads the logs and commits the docs.  The chain
runs detached:

    setsid nohup python -u tools/round4_conductor.py \
        > .r4_conductor.log 2>&1 & echo $! > /tmp/conductor.pid
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


def watched(step, driver, stages, extra_env):
    """Run a stage driver under the self-healing watchdog, foreground."""
    env = dict(os.environ, PYTHONUNBUFFERED="1",
               IM_WATCH_DRIVER=driver,
               IM_WATCH_LOG=f".r4_{step}_stages.log",
               **extra_env)
    return run(step, [sys.executable, "tools/watch_quality_run.py",
                      *stages], env=env)


def main():
    wait_for("/tmp/watchdog.pid")

    # 1. full CPU test suite (TPU and host are idle now)
    run("suite", [sys.executable, "-m", "pytest", "tests/", "-q",
                  "--durations=10"], timeout=3 * 3600)

    # 2. layout sweep on the real chip (one remote compile per variant)
    run("sweep", [sys.executable, "tools/bench_layout_variants.py",
                  *SWEEP_VARIANTS], timeout=3 * 3600)

    # 3. BN-fold bound: is BN ~free at generation time? (ROADMAP item 3)
    run("bnfold", [sys.executable, "tools/bench_bnfold.py"],
        timeout=3600)

    # 4. headline bench line with current defaults
    run("bench", [sys.executable, "bench.py"], timeout=2 * 3600)

    # 5. multiclass quality run (SUIM-like proxy, gens 0-1)
    watched("mc", os.path.join("tools", "run_quality_multiclass.py"),
            ["build", "04", "05", "10", "12", "13", "11", "collect"],
            {"IM_GENS": "0,1"})

    # 6. gens 3-4 extension of the surviving headline strategies: AIM++
    #    (n2) and AIM+ (n 2-4) gens 0-2 resume as no-ops, 3-4 train.
    watched("ext", os.path.join("tools", "run_quality_proxy.py"),
            ["14", "13", "collect"],
            {"IM_GENS": "0,1,2,3,4"})

    # 7. runid-2 replication of the flagship: 03/04 train the runid-2
    #    LDT/ALDT seeds, then 14 replicates the AIM++ trajectory.
    watched("runid2", os.path.join("tools", "run_quality_proxy.py"),
            ["03", "04", "14", "collect"],
            {"IM_GENS": "0,1,2", "IM_RUNIDS": "2"})

    note("chain complete")


if __name__ == "__main__":
    main()
