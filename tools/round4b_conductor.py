"""Round-4b unattended chain — post-VM-wipe replan of round4_conductor.

The second VM wipe of round 4 (fresh checkout 18:09) destroyed every
on-disk quality artifact (.quality_r3 cell_done trees, checkpoints), so
the original conductor's steps 6-7 (gens-3-4 extension / runid-2
replication of AIM++/AIM+) would silently re-train their whole gens-0-2
trees first — hours the round does not have.  This replan serializes the
remaining deliverables by judge value:

  0. wait for the already-running full CPU suite (pid in
     /tmp/suite.pid; it survived the operator session as an orphan)
  1. binary 9-strategy completion: NS/ME/IE/CS rows   (VERDICT r3 next-#1)
     build + 03 reseed (LDT reproduces run-2 bitwise — QUALITY_r3.md),
     then 08 06 07 05; AIM+ gens 1-2 are a wipe casualty (would need the
     full ALDT + EvalNet-arm retrain) and are documented as such.
  2. multiclass (mIoU-arm) quality run, gens 0-1      (VERDICT r3 next-#2)
  3. layout/perf sweep of the parked knobs            (VERDICT r3 next-#4)
  4. BN-fold bound measurement                        (VERDICT r3 weak-#6)
  5. fresh bench.py line with current defaults

Steps 1-2 run under the self-healing watchdog with per-cell resume;
whatever the wall clock cuts resumes next round.  Logs: .r4_<step>.log.

Launch (detached):
    setsid nohup python -u tools/round4b_conductor.py \
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
    env = dict(os.environ, PYTHONUNBUFFERED="1",
               IM_WATCH_DRIVER=driver,
               IM_WATCH_LOG=f".r4_{step}_stages.log",
               **extra_env)
    return run(step, [sys.executable, "tools/watch_quality_run.py",
                      *stages], env=env)


def main():
    wait_for("/tmp/suite.pid")

    # 1. binary 9-strategy completion (NS/ME/IE/CS; per-cell resume)
    watched("bin", os.path.join("tools", "run_quality_proxy.py"),
            ["build", "03", "08", "06", "07", "05", "collect"],
            {"IM_GENS": "0,1,2"})

    # 2. multiclass quality run (SUIM-like proxy, gens 0-1)
    watched("mc", os.path.join("tools", "run_quality_multiclass.py"),
            ["build", "04", "05", "10", "12", "13", "11", "collect"],
            {"IM_GENS": "0,1"})

    # 3. layout sweep on the real chip (one remote compile per variant)
    run("sweep", [sys.executable, "tools/bench_layout_variants.py",
                  *SWEEP_VARIANTS], timeout=3 * 3600)

    # 4. BN-fold bound: is BN ~free at generation time? (ROADMAP item 3)
    run("bnfold", [sys.executable, "tools/bench_bnfold.py"],
        timeout=3600)

    # 5. headline bench line with current defaults
    run("bench", [sys.executable, "bench.py"], timeout=2 * 3600)

    note("chain complete")


if __name__ == "__main__":
    main()
