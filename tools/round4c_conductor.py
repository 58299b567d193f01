"""Round-4c unattended chain — post-wipe-#4 replan of round4b_conductor.

A FOURTH VM wipe destroyed the run-5 reseed mid-flight (NS/ME/IE/CS were
training; only committed numbers survive — QUALITY_r4.md).  This replan
reseeds once more (run 6) and reorders by judge value per unit of
wall-clock risk:

  1. binary 9-strategy completion             (VERDICT r3 next-#1)
     build + 03 reseed (LDT has reproduced identically on three
     provisionings), then the SINGLE-SHOT strategies first — 06 ME,
     07 IE, 05 CS — so rows land early, and the generational 08 NS
     last (its gens resume per cell if cut).
  2. layout/perf sweep of the parked knobs    (VERDICT r3 next-#4)
     bounded ~2.5 h; it was cut by the wipe twice — running it before
     the multi-hour multiclass run guarantees the measurement this time.
  3. BN-fold bound measurement                (VERDICT r3 weak-#6)
  4. fresh bench.py line with current defaults
  5. multiclass (mIoU-arm) quality run, gens 0-1   (VERDICT r3 next-#2)
     longest pole, per-cell resumable — rows are committed as they land
     and whatever the wall clock cuts resumes next round.

Steps 1 and 5 run under the self-healing watchdog with per-cell resume.
Logs: .r4c_<step>.log.

Launch (detached):
    setsid nohup python -u tools/round4c_conductor.py \
        > .r4c_conductor.log 2>&1 & echo $! > /tmp/conductor.pid
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


def run(step, cmd, env=None, timeout=None):
    log = os.path.join(REPO, f".r4c_{step}.log")
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
               IM_WATCH_LOG=f".r4c_{step}_stages.log",
               **extra_env)
    return run(step, [sys.executable, "tools/watch_quality_run.py",
                      *stages], env=env)


def main():
    # 1. binary 9-strategy completion (ME/IE/CS first, generational NS last)
    watched("bin", os.path.join("tools", "run_quality_proxy.py"),
            ["build", "03", "06", "07", "05", "08", "collect"],
            {"IM_GENS": "0,1,2"})

    # 2. layout sweep on the real chip (one remote compile per variant)
    run("sweep", [sys.executable, "tools/bench_layout_variants.py",
                  *SWEEP_VARIANTS], timeout=int(2.5 * 3600))

    # 3. BN-fold bound: is BN ~free at generation time? (ROADMAP item 3)
    run("bnfold", [sys.executable, "tools/bench_bnfold.py"],
        timeout=3600)

    # 4. headline bench line with current defaults
    run("bench", [sys.executable, "bench.py"], timeout=2 * 3600)

    # 5. multiclass quality run (SUIM-like proxy, gens 0-1)
    watched("mc", os.path.join("tools", "run_quality_multiclass.py"),
            ["build", "04", "05", "10", "12", "13", "11", "collect"],
            {"IM_GENS": "0,1"})

    note("chain complete")


if __name__ == "__main__":
    main()
